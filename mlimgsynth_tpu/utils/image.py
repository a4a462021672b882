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


def _resize_float_nchw(t: np.ndarray, th: int, tw: int,
                       resample=None) -> np.ndarray:
    """Per-channel PIL resize of float NCHW [n,c,h,w] (mode 'F', default
    Lanczos; no u8 round-trip)."""
    from PIL import Image
    if resample is None:
        resample = Image.LANCZOS
    n, c = t.shape[:2]
    out = np.empty((n, c, th, tw), np.float32)
    for i in range(n):
        for j in range(c):
            im = Image.fromarray(np.asarray(t[i, j], np.float32), mode="F")
            out[i, j] = np.asarray(im.resize((tw, th), resample),
                                   np.float32)
    return out


def inpaint_crop_region(mask: np.ndarray, w: int, h: int, pad: int,
                        mult: int = 8):
    """A1111 "inpaint at full resolution": padded bounding box of the
    mask (NCHW [1,1,H,W], white = repaint), expanded toward the target
    w:h aspect and clamped to the image.  Returns (x0, y0, x1, y1) in
    image pixels (multiples of ``mult``), or None for an empty mask."""
    m = np.asarray(mask[0, 0]) > 0.5
    ys, xs = np.nonzero(m)
    if ys.size == 0:
        return None
    H, W = m.shape
    y0, y1 = max(0, int(ys.min()) - pad), min(H, int(ys.max()) + 1 + pad)
    x0, x1 = max(0, int(xs.min()) - pad), min(W, int(xs.max()) + 1 + pad)
    # expand the short side toward the processing aspect ratio
    want = w / h
    cw, ch = x1 - x0, y1 - y0
    if cw / ch < want:     # too narrow: widen
        need = min(int(round(ch * want)), W) - cw
        x0 = max(0, x0 - need // 2)
        x1 = min(W, x0 + cw + need)
        x0 = max(0, x1 - min(int(round(ch * want)), W))
    elif cw / ch > want:   # too short: heighten
        need = min(int(round(cw / want)), H) - ch
        y0 = max(0, y0 - need // 2)
        y1 = min(H, y0 + ch + need)
        y0 = max(0, y1 - min(int(round(cw / want)), H))
    # round the box out to multiples of mult (clamped)
    x0, y0 = (x0 // mult) * mult, (y0 // mult) * mult
    x1, y1 = min(W, -(-x1 // mult) * mult), min(H, -(-y1 // mult) * mult)
    return x0, y0, x1, y1


def inpaint_paste(orig: np.ndarray, result: np.ndarray, mask: np.ndarray,
                  box) -> np.ndarray:
    """Resize the processed crop back to the box and blend it into the
    original image under the mask (float NCHW, [0,1])."""
    x0, y0, x1, y1 = box
    res = _resize_float_nchw(result, y1 - y0, x1 - x0)
    out = np.array(orig, np.float32, copy=True)
    m = np.asarray(mask[:, :1, y0:y1, x0:x1], np.float32)
    out[:, :, y0:y1, x0:x1] = (res * m
                               + out[:, :, y0:y1, x0:x1] * (1.0 - m))
    return np.clip(out, 0.0, 1.0)


def mask_gaussian_blur(mask: np.ndarray, radius: float) -> np.ndarray:
    """Gaussian-blur a float NCHW [n,1,H,W] mask (A1111 ``mask_blur``:
    softens inpaint seams).  Separable numpy convolution with
    edge-replicate padding (PIL's GaussianBlur rejects mode-'F')."""
    sigma = max(float(radius), 1e-3)
    r = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()

    def blur1d(a, axis):
        p = [(0, 0)] * a.ndim
        p[axis] = (r, r)
        a = np.pad(a, p, mode="edge")
        return np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="valid"), axis, a)

    out = np.asarray(mask, np.float32)
    out = blur1d(out, 2)
    out = blur1d(out, 3)
    return np.clip(out, 0.0, 1.0, out)
