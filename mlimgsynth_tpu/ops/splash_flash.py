"""Large-S self-attention through the JAX splash-attention TPU kernel.

``jax.experimental.pallas.ops.tpu.splash_attention`` is the newer public
pallas attention family (block-sparse mask consumption: fully-masked
blocks are skipped entirely, partial blocks apply the mask in-kernel).
Where the stock flash wrapper (ops/stock_flash.py) pads kv to a 512
multiple and still computes the pad blocks under a segment-ids mask,
splash takes a rectangular "kv < S" mask and never schedules the pad
work; it also uses a different grid schedule that may simply be faster.

Dispatch policy mirrors stock_flash: the wrapper only serves the DiT
large-S self/joint-attention regime, with the identical scoped-VMEM
promotion gate (in-loop Pallas outputs strictly larger than the 16 MiB
stack are unpromotable -> deterministic; round-3 planner findings in
ops/flash_attention._plan_flash).  Adoption is data-driven: default off
until the queue-35 hardware A/B (tools/flash_splash_ab.py) records a
win over the shipped stock path; ``MLIS_FLASH_SPLASH=auto|force|0``.

Reference behavior anchor: softmax(QK^T/sqrt(d))V,
/root/reference/src/ggml_extend.c:200-222 (the reference's own flash
path is disabled-as-broken).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import stock_flash as _sf

_ENV = "MLIS_FLASH_SPLASH"

# default block geometry; override with MLIS_SPLASH_BLOCK="bq,bkv"
_BLOCK_Q = 512
_BLOCK_KV = 512


def mode() -> str:
    """'off' (default until the hardware A/B lands), 'auto', or 'force'
    (tests: skip the size gates so tiny interpret shapes exercise it)."""
    v = os.environ.get(_ENV, "off").lower()
    if v in ("", "0", "false", "no", "off"):
        return "off"
    if v == "force":
        return "force"
    return "auto"


def _blocks() -> tuple[int, int]:
    env = os.environ.get("MLIS_SPLASH_BLOCK")
    if env:
        bq, bkv = (int(x) for x in env.split(","))
        return bq, bkv
    return _BLOCK_Q, _BLOCK_KV


def eligible(q, k, v, causal: bool, mesh=None) -> bool:
    m = mode()
    if m == "off":
        return False
    if causal:
        return False
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sq != sk or v.shape[2] != sk or v.shape[3] != d:
        return False                     # self/joint attention only
    if q.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if d != 64 and d % 128:
        return False                     # lane constraint (DiT: 64/128)
    if m == "force":
        return True
    if q.dtype != jnp.bfloat16:
        return False    # f32 outputs S(1)-place even above 16 MiB (r3)
    if sk < 2048:
        return False                     # ours wins the small-S regime
    if mesh is not None:                 # per-device block inside shard_map
        from ..parallel.mesh import DP_AXIS, TP_AXIS
        b //= mesh.shape.get(DP_AXIS, 1)
        h //= mesh.shape.get(TP_AXIS, 1)
    # unpromotable by size — naturally, or via bounded zero-padding of q
    # (padded q rows attend the real kv and are sliced off; same policy
    # and bound as stock_flash)
    return (_sf._padded_sq(b, h, sq, d, q.dtype.itemsize)
            <= sq * _sf._MAX_QPAD)


@functools.lru_cache(maxsize=None)
def _kernel(h: int, sp: int, s_valid: int, bq: int, bkv: int):
    """Splash MHA kernel for [h, sp, d] operands where only the first
    ``s_valid`` kv columns are real.  The rectangular numpy mask lets
    splash SKIP fully-padded kv blocks; padded *q* rows see the real kv
    (finite outputs) and are sliced off by the caller."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak, splash_attention_mask as sam)
    if s_valid == sp:
        mask = sam.FullMask((sp, sp))
    else:
        m = np.zeros((sp, sp), dtype=np.bool_)
        m[:, :s_valid] = True
        mask = sam.NumpyMask(m)
    mh = sam.MultiHeadMask([mask] * h)
    bs = sak.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=bkv)
    # off-TPU (tests, force mode) the kernel must interpret; on TPU the
    # backend is fixed by the time the first trace happens
    return sak.make_splash_mha(mh, block_sizes=bs, head_shards=1,
                               q_seq_shards=1,
                               interpret=jax.default_backend() != "tpu")


def splash_flash(q, k, v, scale=None):
    """q,k,v [B,H,S,D] -> [B,H,S,D] via the splash MHA kernel.

    Splash takes no softmax scale: it is folded into q.  Sequences pad
    to a block multiple; the pad kv columns are masked out block-sparsely
    (skipped, not computed).  When the natural output sits inside the
    VMEM promotion window, q additionally pads into the unpromotable
    regime (same policy as stock_flash.stock_flash)."""
    b, h, s, d = q.shape
    if scale is None:
        scale = float(d) ** -0.5
    q = q * jnp.asarray(scale, q.dtype)
    bq, bkv = _blocks()
    blk = max(bq, bkv)
    sp = -(-s // blk) * blk
    # promotion-window escape: pad q rows beyond the 16 MiB stack
    sq_pad = _sf._padded_sq(b, h, sp, d, q.dtype.itemsize)
    if sp < sq_pad <= sp * _sf._MAX_QPAD:
        sp = -(-sq_pad // blk) * blk
    if sp != s:
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    kern = _kernel(h, sp, s, min(bq, sp), min(bkv, sp))
    o = jax.vmap(kern)(q, k, v)
    return o[:, :, :s, :] if sp != s else o
