"""Dependency-free PNG writer (stdlib only).

Counterpart of the reference's demo helper (reference: python/minimal_png.py)
so the demos can run without imaging libraries.
"""
import struct
import zlib


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data +
            struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_write(path, width: int, height: int, data: bytes,
              channels: int = 3) -> None:
    """Write an 8-bit PNG from raw interleaved pixel bytes (RGB or RGBA)."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    raw = bytearray()
    stride = width * channels
    for y in range(height):
        raw.append(0)  # filter: none
        raw.extend(data[y * stride:(y + 1) * stride])
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8,
                                       color_type, 0, 0, 0))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)


if __name__ == "__main__":
    # tiny self-test: 2x2 RGB gradient
    png_write("/tmp/minimal_png_test.png", 2, 2,
              bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]))
    print("wrote /tmp/minimal_png_test.png")
