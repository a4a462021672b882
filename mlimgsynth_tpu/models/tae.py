"""Tiny autoencoder (madebyollin/taesd, diffusers AutoencoderTiny layout).

reference: src/tae.c.  Weights load from a separate file under the ``tae.``
prefix with their original diffusers names (``tae.encoder.layers.N...``,
ref: src/mlimgsynth.c:1187-1194).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from . import blocks as B


@dataclass(frozen=True)
class TaeParams:
    """ref: src/tae.c:17-22."""
    ch_x: int = 3
    ch_inner: int = 64
    ch_z: int = 4
    n_blk: int = 3


TAE_SD1 = TaeParams()


def tae_block(ctx: B.Ctx, pre: str, x, ch_out: int):
    """ref: mlb_sdtae_block (src/tae.c:24-39)."""
    ch_in = x.shape[-1]
    x0 = x
    x = B.conv2d(ctx, pre + ".conv.0", x, ch_out)
    x = jnp.maximum(x, 0)
    x = B.conv2d(ctx, pre + ".conv.2", x, ch_out)
    x = jnp.maximum(x, 0)
    x = B.conv2d(ctx, pre + ".conv.4", x, ch_out)
    if ch_in != ch_out:
        x0 = B.conv2d(ctx, pre + ".skip", x0, ch_out, 1, 1, pad=0, bias=False)
    return jnp.maximum(x + x0, 0)


def tae_encode_apply(ctx: B.Ctx, img, P: TaeParams, pre: str = "tae"):
    """img [N,H,W,3] in [0,1] -> latent [N,H/8,W/8,4] (unscaled taesd space).
    ref: mlb_sdtae_encoder (src/tae.c:43-63)."""
    x = img.astype(ctx.dtype)
    epre = pre + ".encoder.layers"
    iblk = 0
    x = B.conv2d(ctx, f"{epre}.{iblk}", x, P.ch_inner); iblk += 1
    x = tae_block(ctx, f"{epre}.{iblk}", x, P.ch_inner); iblk += 1
    for _ in range(3):
        x = B.conv2d(ctx, f"{epre}.{iblk}", x, P.ch_inner, 3, 2, pad=1,
                     bias=False); iblk += 1
        for _ in range(P.n_blk):
            x = tae_block(ctx, f"{epre}.{iblk}", x, P.ch_inner); iblk += 1
    x = B.conv2d(ctx, f"{epre}.{iblk}", x, P.ch_z)
    return x


def tae_decode_apply(ctx: B.Ctx, latent, P: TaeParams, pre: str = "tae"):
    """latent [N,h,w,4] (unscaled) -> img [N,8h,8w,3] in [0,1].
    ref: mlb_sdtae_decoder (src/tae.c:65-92)."""
    x = latent.astype(ctx.dtype)
    x = jnp.tanh(x / 3.0) * 3.0  # input clamp (src/tae.c:71-73)
    dpre = pre + ".decoder.layers"
    iblk = 0
    x = B.conv2d(ctx, f"{dpre}.{iblk}", x, P.ch_inner); iblk += 1
    x = jnp.maximum(x, 0); iblk += 1
    for _ in range(3):
        for _ in range(P.n_blk):
            x = tae_block(ctx, f"{dpre}.{iblk}", x, P.ch_inner); iblk += 1
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2); iblk += 1
        x = B.conv2d(ctx, f"{dpre}.{iblk}", x, P.ch_inner, bias=False); iblk += 1
    x = tae_block(ctx, f"{dpre}.{iblk}", x, P.ch_inner); iblk += 1
    x = B.conv2d(ctx, f"{dpre}.{iblk}", x, P.ch_x)
    return x
