"""Large-S self-attention through the stock JAX pallas TPU flash kernel.

``jax.experimental.pallas.ops.tpu.flash_attention`` is public JAX library
code shipped with the installed jax.  Round-4 measurement (docs/BENCH.md
queue #22, tools/flash_stock_ab.py) showed that at the SD3 joint shape
(bh=48, S=4250, d=64) it runs 5.4-5.8 ms/attention vs 8.5 ms for our
transposed-v kernel — and our own ablations (queue #21) proved the gap
is the kernel's grid/block structure, not softmax work (ablating softmax
entirely saved ~6%).  Rather than chase its scheduling, the dispatch
layer routes the large-S self/joint-attention regime here and keeps our
kernel (better at the small-S ragged UNet shapes, no kv-padding
requirement, transposed-v layout) everywhere else.

VMEM-promotion safety: in-loop Pallas outputs can be nondeterministically
promoted to scoped vmem S(1) and blow the 16 MiB stack (round-3 planner
findings, ops/flash_attention._plan_flash docstring).  Outputs STRICTLY
LARGER than the stack are unpromotable, so this path is gated to
per-device output sizes > 16 MiB — which is exactly the DiT regime it
targets (SD3/SD3.5/Flux joint attention); smaller shapes keep using our
planner-protected kernel.  The gate uses the PER-DEVICE shape under a
mesh (shard_map shrinks the heads axis).

Reference behavior anchor: softmax(QK^T/sqrt(d))V, src/ggml_extend.c:
200-222 (the reference's own flash path is disabled-as-broken).
"""
from __future__ import annotations

import functools
import os

import jax.numpy as jnp

_ENV = "MLIS_FLASH_STOCK"

# kv must divide block_k_major; q may be ragged (the stock kernel cdivs).
_KV_PAD = 512
_PROMOTION_STACK = 16 * 2 ** 20


def _padded_sq(b: int, h: int, sq: int, d: int, itemsize: int) -> int:
    """Smallest 128-multiple q length >= sq whose [b,h,sq',d] pallas
    output STRICTLY exceeds the scoped-vmem stack (unpromotable).  Padded
    q rows are zeros and their output rows are sliced off; this is how
    batch-1 DiT shapes (e.g. sd3-turbo cfg1: 13 MiB out) reach the
    deterministic-safety regime — queue #24 measured the batch-1 ours-t
    path at ~2.8x the per-NFE cost of the batched stock path."""
    per_row = b * h * d * itemsize
    if sq * per_row > _PROMOTION_STACK:
        return sq                        # already unpromotable
    need = _PROMOTION_STACK // per_row + 1
    return -(-need // 128) * 128


# padding beyond this ratio costs more than the kernel swap saves
_MAX_QPAD = 1.35

# Regime-(a) budget for the sub-16MiB UNet gate: kernel frame + promoted
# output must fit the scoped-VMEM stack with the same ~1 MiB slack
# ops/flash_attention.VMEM_BUDGET keeps.
_VMEM_BUDGET = int(15.0 * 1024 * 1024)


def _stock_frame(bq: int, bkm: int, d: int, it: int) -> int:
    """Conservative scoped-VMEM frame model for the stock kernel at
    (block_q=bq, block_k_major=block_k=bkm): double-buffered q/k/v/out
    windows (lanes pad d to 128), f32 m/l [bq,128] + acc [bq,dpad]
    scratch, and the f32 [bq,bkm] logits product (p reuses it — same
    accounting ops/flash_attention._scoped_vmem calibrated on v5e)."""
    dpad = max(-(-d // 128) * 128, 128)
    windows = 2 * (bq * dpad + 2 * bkm * dpad + bq * dpad) * it
    scratch = (2 * bq * 128 + bq * dpad) * 4
    logits = bq * bkm * 4
    return windows + scratch + logits


def _unet_blocks(b: int, h: int, sq: int, sk_pad: int, d: int,
                 it: int) -> tuple[int, int] | None:
    """Smallest-risk (block_q, block_k_major) whose frame + full output
    fits the regime-(a) budget at a promotion-window shape; None when no
    choice fits (caller stays on the planner-protected ours-t kernel)."""
    out_b = b * h * sq * d * it
    for bq in (512, 256, 128):
        if bq > sq:
            continue
        for bkm in (1024, 512, 256, 128):
            if sk_pad % bkm:
                continue
            if _stock_frame(bq, bkm, d, it) + out_b <= _VMEM_BUDGET:
                return bq, bkm
    return None


def unet_mode() -> str:
    """UNet-regime routing through the stock kernel ('off' default until
    queue-42 A/B data lands; 'auto' = regime-(a)-gated; 'force')."""
    v = os.environ.get("MLIS_FLASH_UNET_STOCK", "off").lower()
    if v in ("1", "auto", "on", "true", "yes"):
        return "auto"
    if v == "force":
        return "force"
    return "off"


def unet_eligible(b: int, h: int, sq: int, sk: int, d: int,
                  itemsize: int = 2) -> bool:
    """Natural-layout stock routing for the small-S UNet self-attention
    regime (promotion-window outputs, regime-(a) safety).  Called by
    attn_mhead BEFORE projections so the layout choice folds into the
    einsums — kernel-only cost, no relayout (queue #25 measured the
    relayout version losing; queue #42 measures this one)."""
    m = unet_mode()
    if m == "off" or mode() == "off":
        return False
    if sq != sk or sq < 512 or d > 128:
        return False
    if m == "force":
        return True
    sk_pad = -(-sk // _KV_PAD) * _KV_PAD
    out_b = b * h * sq * d * itemsize
    if out_b > _PROMOTION_STACK:
        return False                     # large-S regime: eligible() owns it
    return _unet_blocks(b, h, sq, sk_pad, d, itemsize) is not None


def mode() -> str:
    """'auto' (default: size-gated), 'off', or 'force' (tests: skip the
    size gates so tiny CPU-interpret shapes exercise the path)."""
    v = os.environ.get(_ENV, "auto").lower()
    if v in ("0", "false", "no", "off"):
        return "off"
    if v == "force":
        return "force"
    return "auto"


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
    if d > 128 and d % 128:
        return False                     # stock kernel lane constraint
    if sq < 128:
        return False                     # block_q minimum
    if m == "force":
        return True
    if q.dtype != jnp.bfloat16:
        return False    # f32 outputs S(1)-place even above 16 MiB (r3 finding)
    if mesh is not None:                 # per-device block inside shard_map
        from ..parallel.mesh import DP_AXIS, TP_AXIS
        b //= mesh.shape.get(DP_AXIS, 1)
        h //= mesh.shape.get(TP_AXIS, 1)
    # unpromotable by size — naturally, or via bounded zero-padding of q
    if (sk >= 2048
            and _padded_sq(b, h, sq, d, q.dtype.itemsize) <= sq * _MAX_QPAD):
        return True
    # small-S / promotion-window UNet regime (opt-in, regime-(a) gated)
    return unet_eligible(b, h, sq, sk, d, q.dtype.itemsize)


@functools.lru_cache(maxsize=None)
def _block_sizes(bq: int, bkm: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes
    return BlockSizes(block_q=bq, block_k_major=bkm, block_k=bkm,
                      block_b=1, block_q_major_dkv=bq, block_k_major_dkv=bkm,
                      block_k_dkv=bkm, block_q_dkv=bq, block_k_major_dq=bkm,
                      block_k_dq=bkm, block_q_dq=bq)


def stock_flash(q, k, v, scale=None):
    """q,k,v [B,H,S,D] -> [B,H,S,D].  Pads kv to a _KV_PAD multiple and
    masks the pad rows via segment ids (queue #22: the segids cost is
    ~0.4 ms at the SD3 shape, still 1.5x ahead of our kernel)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention as jax_flash)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = float(d) ** -0.5
    # zero-pad q into the unpromotable-output regime when the natural
    # output sits in the promotion window (batch-1 DiT shapes); padded
    # rows attend real kv (finite) and are sliced off the output
    sq_out = sq
    sq_pad = _padded_sq(b, h, sq, d, q.dtype.itemsize)
    if sq < sq_pad <= sq * _MAX_QPAD:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, sq_pad - sq), (0, 0)])
        sq = sq_pad
    seg = None
    sk_pad = -(-sk // _KV_PAD) * _KV_PAD
    if sk_pad != sk:
        pad = [(0, 0), (0, 0), (0, sk_pad - sk), (0, 0)]
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        ids_kv = (jnp.arange(sk_pad) >= sk).astype(jnp.float32)
        seg = SegmentIds(q=jnp.zeros((b, sq), jnp.float32),
                         kv=jnp.broadcast_to(ids_kv, (b, sk_pad)))
    env = os.environ.get("MLIS_STOCK_BLOCK")
    if env:
        bq, bkm = (int(v) for v in env.split(","))
    elif b * h * sq * d * q.dtype.itemsize <= _PROMOTION_STACK:
        # promotion-window output (UNet regime): blocks must satisfy
        # regime (a) — kernel frame + promoted output under the budget
        plan = _unet_blocks(b, h, sq, sk_pad, d, q.dtype.itemsize)
        bq, bkm = plan if plan else (min(512, (sq // 128) * 128),
                                     next(x for x in (512, 256, 128)
                                          if sk_pad % x == 0))
    else:
        bkm = next(x for x in (1536, 1024, 512, 256, 128) if sk_pad % x == 0)
        bq = min(512, (sq // 128) * 128)  # block_q must not exceed sq
    o = jax_flash(q, k, v, segment_ids=seg, causal=False,
                  sm_scale=float(scale), block_sizes=_block_sizes(bq, bkm))
    return o[:, :, :sq_out, :] if sq_out != sq else o
