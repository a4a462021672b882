"""Image buffers and codecs.

Counterpart of the reference's image + codec layer
(reference: src/ccommon/image*.{h,c}): 8-bit images, PNG with the A1111
``parameters`` tEXt metadata chunk (image_io_png.c:310), JPEG, PNM; plus the
tensor<->image converters (reference: src/mlimgsynth.c:100-152) and the
trivial ``TENSOR`` file format used for latent save/load
(reference: src/localtensor.c:196-253).

Tensors at this boundary are numpy float32 in NCHW-like order ``[n,c,h,w]``
(the row-major view of the reference's ggml ``[w,h,c,n]`` layout) so TENSOR
files are byte-compatible.
"""
from __future__ import annotations

import io
import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np


def tensor_from_image_arr(img: np.ndarray) -> np.ndarray:
    """uint8 [h,w,c] -> float32 [1,c,h,w] in [0,1]."""
    if img.ndim == 2:
        img = img[:, :, None]
    x = img.astype(np.float32) / 255.0
    return x.transpose(2, 0, 1)[None]


def tensor_to_image_arr(t: np.ndarray, idx: int = 0) -> np.ndarray:
    """float32 [n,c,h,w] in [0,1] -> uint8 [h,w,c]."""
    x = np.clip(t[idx] * 255.0, 0, 255).astype(np.uint8)
    return x.transpose(1, 2, 0)


def image_save(path: str, img: np.ndarray, infotext: Optional[str] = None
               ) -> None:
    """Save uint8 [h,w,c]; PNG embeds infotext as the A1111 'parameters'
    tEXt key."""
    from PIL import Image
    from PIL.PngImagePlugin import PngInfo
    if img.shape[2] == 1:
        img = img[:, :, 0]
    im = Image.fromarray(img)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".png":
        info = PngInfo()
        if infotext:
            info.add_text("parameters", infotext)
        im.save(path, pnginfo=info)
    elif ext in (".jpg", ".jpeg"):
        im.save(path, quality=95)
    elif ext in (".ppm", ".pnm", ".pgm"):
        im.save(path)
    else:
        im.save(path)


def image_load(path: str) -> np.ndarray:
    """Load an image as uint8 [h,w,c] (keeps alpha if present)."""
    from PIL import Image
    im = Image.open(path)
    if im.mode not in ("RGB", "RGBA", "L"):
        im = im.convert("RGBA" if "A" in im.mode else "RGB")
    arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


# ---------------------------------------------------------------------------
# TENSOR file format (reference: src/localtensor.c:196-253)
# "TENSOR F32 n0 n1 n2 n3\n" + raw float32 data, ggml dim order (w h c n).
# ---------------------------------------------------------------------------

def tensor_save(path: str, t: np.ndarray) -> None:
    """t: float32 [n,c,h,w]."""
    t = np.ascontiguousarray(t, dtype=np.float32)
    n, c, h, w = t.shape
    with open(path, "wb") as f:
        f.write(f"TENSOR F32 {w} {h} {c} {n}\n".encode())
        f.write(t.tobytes())


def tensor_load(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"\n"):
            ch = f.read(1)
            if not ch or len(header) > 128:
                raise ValueError("invalid TENSOR file header")
            header += ch
        parts = header.decode().split()
        if len(parts) != 6 or parts[0] != "TENSOR" or parts[1] != "F32":
            raise ValueError(f"invalid TENSOR header: {header!r}")
        w, h, c, n = (int(x) for x in parts[2:6])
        data = np.frombuffer(f.read(), np.float32, n * c * h * w)
        return data.reshape(n, c, h, w).copy()


def mask_downsize(mask: np.ndarray, f: int) -> np.ndarray:
    """Block-mean downsize of a [n,1,h,w] mask by factor f
    (reference: ltensor_downsize, src/localtensor.c:161-194)."""
    n, c, h, w = mask.shape
    assert h % f == 0 and w % f == 0
    return mask.reshape(n, c, h // f, f, w // f, f).mean(axis=(3, 5))


def image_alpha_split(t: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[n,4,h,w] -> rgb [n,3,h,w], mask [n,1,h,w]
    (reference: OPTION(IMAGE) alpha split, mlimgsynth_options_set.c.h)."""
    return t[:, :3], t[:, 3:4]


def png_read_parameters(path: str) -> Optional[str]:
    """Read back the A1111 'parameters' tEXt metadata from a PNG."""
    from PIL import Image
    im = Image.open(path)
    return im.info.get("parameters")


def tensor_img_redblue(t2d: np.ndarray) -> np.ndarray:
    """Red/blue visualization of a single-channel 2-D tensor: negative values
    red, positive blue, scaled by the max magnitude
    (reference: ltensor_img_redblue, src/localtensor.c:305-344).
    Input [h,w]; returns uint8 [h,w,3]."""
    v = np.asarray(t2d, np.float32)
    scale = max(float(v.max(initial=0.0)), float(-v.min(initial=0.0)), 1e-12)
    img = np.zeros(v.shape + (3,), np.uint8)
    img[..., 0] = np.clip(-v, 0, None) * (255.0 / scale)
    img[..., 2] = np.clip(v, 0, None) * (255.0 / scale)
    return img
