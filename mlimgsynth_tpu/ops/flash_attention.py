"""Pallas TPU flash-attention kernels.

Replaces the reference's full-softmax attention (src/ggml_extend.c:200-222;
its flash path is disabled as broken, Makefile:42-45) with online-softmax
tiled kernels: O(S) memory instead of O(S^2), logits never leave VMEM.  This
is what makes SDXL-1024 self-attention (S=16384, 20+ heads) fit and fly on a
single chip without the reference's --vae-tile/--unet-split workarounds.

Two kernels share the same structure — grid (batch*heads, q_blocks,
k_blocks) with the k-loop as the minor (sequential) axis, running max /
accumulator in VMEM scratch, f32 accumulation:

* ``flash_attention``   — natural [seq, d] layout;
* ``flash_attention_t`` — transposed v/output ([d, seq]); the DEFAULT for
  the UNet (via attn_mhead): d_head streams on MXU sublanes, so SD1's d=40
  and SDXL's d=64 heads pay no 128-lane output padding.

Shared tricks: softmax in base-2 with scale*log2(e) folded into q; kv-pad
masking only on the tail k block; the softmax denominator produced by the
MXU via a ones column/row riding existing padding; a no-carry fast path
when the whole kv fits one block; block sizes (and sometimes extra q
padding) chosen by ``_plan_flash`` so that XLA's unpredictable S(1)
promotion of the output can never overflow the 16 MiB scoped-VMEM stack
(overflow is a hard, nondeterministic compile error — see _plan_flash
for the calibrated accounting).  Numerics are validated on device by
tools/flash_check.py; compile determinism by tools/vmem_determinism.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Larger blocks measured ~10-15% faster e2e than 512x512 on v5e
# (SD1.5 0.725->0.632s, SDXL 3.38->2.95s); the round-2 sweep found
# 2048x2048 best by ~1% over 1024x2048 on both SD1.5 and SDXL (docs/
# BENCH.md).  Tune via MLIS_FLASH_BLOCK.  Wide heads (dp>128) are
# clamped to a VMEM budget in the wrappers.
DEFAULT_BLOCK_Q = 2048
DEFAULT_BLOCK_K = 2048
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  kv_len: int, block_k: int, causal: bool,
                  q_len: int, block_q: int, mask_tail: bool, d_sum: int,
                  single_k: bool, mxu_sum: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]            # [bq, d]  (pre-scaled by scale*log2(e))
    k = k_ref[0]            # [bk, d]
    # softmax runs in base-2 (exp2 is the native TPU transcendental); the
    # scale*log2(e) factor is folded into q OUTSIDE the kernel — one cheap
    # [sq,d] pass instead of a [bq,bk] VPU pass per k block
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if causal:
        # causal triangle + padded kv columns, every block
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
            + pl.program_id(1) * block_q
        mask = jnp.logical_and(col < kv_len, col <= row + (kv_len - q_len))
        s = jnp.where(mask, s, NEG_INF)
    elif mask_tail:
        # only the LAST k block has padded columns; interior blocks skip
        # the iota/compare/select passes entirely (VPU savings per block)
        def _mask(s):
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ik * block_k)
            return jnp.where(col < kv_len, s, NEG_INF)

        s = jax.lax.cond(ik == nk - 1, _mask, lambda s: s, s)

    # With mxu_sum, v carries a ones column at index d_sum (appended by the
    # wrapper), so the PV matmul also produces the softmax denominator
    # Sum(p) on the MXU — the separate [bq,bk] VPU sum pass is gone.  The l
    # recurrence is the same alpha rescale as the accumulator, so it rides
    # along exactly.  mxu_sum is only enabled when d % 128 != 0: the extra
    # column then lives in lane padding that exists anyway; for 128-multiple
    # heads (e.g. the VAE's d=512) it would widen the padded output by a
    # whole 128-lane tile (observed scoped-VMEM OOM at SDXL-1024 decode),
    # so those shapes keep the VPU sum.
    if single_k:
        # whole kv in one block: no online-softmax carry state at all
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m).astype(v_ref.dtype)
        pv = jax.lax.dot_general(
            p, v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mxu_sum:
            l = pv[:, d_sum:d_sum + 1]
        else:
            l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        o_ref[0] = (pv / l).astype(o_ref.dtype)
        return

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if not mxu_sum:
            l_scr[:] = jnp.zeros_like(l_scr)

    m_prev = m_scr[:]                      # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)       # [bq, 1]
    # p materializes directly in the v dtype (bf16 on the hot path): halves
    # the bytes of the PV input.  (f32 inputs keep f32 p: correctness-mode
    # numerics unchanged.)
    p = jnp.exp2(s - m_new).astype(v_ref.dtype)    # [bq, bk]

    m_scr[:] = m_new
    if not mxu_sum:
        l_scr[:] = l_scr[:] * alpha + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32)
    pv = jax.lax.dot_general(
        p, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(ik == nk - 1)
    def _done():
        acc = acc_scr[:]
        l = (acc[:, d_sum:d_sum + 1] if mxu_sum else l_scr[:])
        o_ref[0] = (acc / l).astype(o_ref.dtype)


def _scoped_vmem(bq, bk, dp, dv, itemsize):
    """Model of the kernel's contribution to XLA's scoped-VMEM stack,
    calibrated against compiler-reported stack sizes on v5e:

    * SD2 L1 in-loop t-kernel (2048,1024) dp=64 dv=80 + promoted 6.55M
      output -> "17.39M" reported => kernel alone 10.84M; this model
      gives 10.82M (windows 1.77 + scratch 0.66 + f32 logits 8.39);
    * (2048,2048) d=40 std kernel fails at "19.32M" => model 18.9M;
    * wide-head (2048,256) d=512 fails at "16.16M" => model 15.7M.

    The low-precision exp2 product p reuses the f32 logits allocation (it
    never appears as a separate term in the compiler reports), so only
    the f32 [bq,bk] product is counted."""
    windows = 2 * (bq * dp + bk * dp + bk * dv + bq * dv) * itemsize
    scratch = bq * dv * 4 + 2 * bq * 4        # acc + m/l
    logits = bq * bk * 4                      # f32 QK product
    return windows + scratch + logits


# XLA's scoped-VMEM stack is 16.0 MiB (hard).  The budget keeps ~1M slack
# for the 0.4-0.9M the compiler reports above _scoped_vmem at calibrated
# shapes.
VMEM_BUDGET = int(15.0 * 1024 * 1024)
SCOPED_LIMIT = 16 * 1024 * 1024


def _plan_flash(bq, bk, dp, dv, it, bh, sq, causal, dv_alt=None):
    """Block sizes under the ALWAYS-PROMOTED policy, round-3 revision 3.

    XLA sometimes places a pallas_call's output in the scoped-VMEM stack
    (S(1)); which outputs get promoted is not predictable program-to-
    program.  The round-3 in-loop sd21 OOM taught the true accounting:
    the charged frame is kernel stack + the FULL output — splitting the
    output into bh/q chunks does NOT reduce the peak, because every chunk
    stays live until the stitch concatenate (the reported 17.39M was
    identical for 6.55M-total outputs chunked [7,3] and [6,4]).  The
    deterministic-safe regimes:

      (a) _scoped_vmem(blocks) + total_output <= VMEM_BUDGET;
      (b) total_output > SCOPED_LIMIT — a bf16 output strictly larger
          than the whole 16 MiB stack is never promoted (in-loop bench
          evidence at 32-48 MiB: batch-8 and VAE-1024 attention);
      (d) shrink the output minor: drop the MXU-softmax-denominator ones
          row so dv falls back to the bare sublane tile (``dv_alt``,
          80->64 for d=64, 528->512 for the VAE head), which is often
          exactly what regime (a) needs.  Costs one VPU sum per
          [bq,bk] block (the kernels carry an l column either way).

    Regime (c) — f32 outputs crossing SCOPED_LIMIT — was tried and is
    FALSIFIED on v5e: f32 pallas outputs get S(1)-placed categorically
    (observed standalone AND in-loop, 23.6-29.5 MB outputs, charges
    17.39-17.82M > 16M limit), so crossing the stack size does not
    protect them.  Only bf16/native-dtype outputs ride regime (b).

    Returns (bq, bk, sq_p, use_alt_dv).  sq_p may exceed the block-
    aligned q length: when no block choice reaches (a) at either dv and
    the output sits under (b), the q axis is PADDED with whole extra
    blocks until the output crosses SCOPED_LIMIT — bounded extra MXU
    work beats a nondeterministic compile failure (the padded rows are
    zeros, softmax stays finite, callers slice the result).  Preference
    among feasible choices: fewest q rows, then largest bq*bk, then the
    most square (largest min(bq,bk): extreme bq starves the k axis with
    online-softmax carries, extreme bk re-streams k/v once per tiny q
    block), then largest bq (matches the round-2 measured best
    (2048,1024)), then the MXU-denominator variant (measured faster at
    equal blocks)."""
    def ladder(v, lo):
        out = []
        while v >= lo:
            out.append(v)
            v //= 2
        return out

    dvs = [(dv, False)]
    if dv_alt is not None and dv_alt < dv:
        dvs.append((dv_alt, True))

    import os
    if os.environ.get("MLIS_FLASH_SAFE", "1") in ("0", "false", "no"):
        # risk-tolerant mode: ignore the output term (the pre-round-3
        # behavior).  Outputs are USUALLY left in HBM — this restores the
        # larger proven-fast blocks at the cost of a nondeterministic
        # compile-OOM roulette on promotion-prone programs (SD2/SDXL L1).
        for bq_ in ladder(bq, 512):
            for bk_ in ladder(bk, 256):
                if _scoped_vmem(bq_, bk_, dp, dv, it) <= VMEM_BUDGET:
                    return bq_, bk_, pl.cdiv(sq, bq_) * bq_, False

    best = None

    def consider(bq_, bk_, sq_p, alt):
        nonlocal best
        key = (-sq_p, bq_ * bk_, min(bq_, bk_), bq_, 0 if alt else 1)
        if best is None or key > best[0]:
            best = (key, bq_, bk_, sq_p, alt)

    for bq_ in ladder(bq, 512):
        sq_p = pl.cdiv(sq, bq_) * bq_
        for dv_, alt in dvs:
            out_b = bh * sq_p * dv_ * it
            for bk_ in ladder(bk, 256):
                s = _scoped_vmem(bq_, bk_, dp, dv_, it)
                if s <= VMEM_BUDGET and (out_b > SCOPED_LIMIT
                                         or s + out_b <= VMEM_BUDGET):
                    consider(bq_, bk_, sq_p, alt)
                    break   # smaller bk_ never preferred at this bq_/dv_
    if best is not None:
        _, bq_, bk_, sq_p, alt = best
        return bq_, bk_, sq_p, alt

    # No block choice satisfies (a) at either dv: pad the q axis into
    # regime (b), at whichever dv needs fewer padded rows.
    for bq_ in ladder(bq, 512):
        for dv_, alt in dvs:
            bk_ok = None
            for bk_ in ladder(bk, 256):
                if _scoped_vmem(bq_, bk_, dp, dv_, it) <= VMEM_BUDGET:
                    bk_ok = bk_
                    break
            if bk_ok is None:
                continue
            sq_p = pl.cdiv(sq, bq_) * bq_
            while bh * sq_p * dv_ * it <= SCOPED_LIMIT:
                sq_p += bq_
            consider(bq_, bk_ok, sq_p, alt)
    if best is not None:
        _, bq_, bk_, sq_p, alt = best
        return bq_, bk_, sq_p, alt

    from ..utils.log import g_logger
    g_logger.warning(
        f"flash planner: no deterministic-safe blocks for d=({dp},{dv}) "
        f"bh={bh} sq={sq}; compile may OOM")
    return 512, 256, pl.cdiv(sq, 512) * 512, False


def _plan_flash_padopt(bq_cap, bk_cap, dp, dv, it, bh, sq, sk, dv_alt=None):
    """Padding-aware block search (MLIS_FLASH_PADOPT=1, off by default).

    _plan_flash's pow2 ladder wastes logits-space work at non-pow2
    sequence lengths — the kernel is VPU-(logits-)bound, so padding IS
    runtime: SD3's joint S=4250 pads 23% (bq=512/bk=1024 -> 4608x5120),
    SD2-768's L1 S=2304 pads 48% (2560x3072).  This search instead
    minimizes sq_p*sk_p over ALL 128-aligned block sizes (both kernels'
    tile constraints are multiples of 128 on the relevant minor dims)
    under the SAME deterministic-safety regimes as _plan_flash: regime
    (a) stack+output <= budget, regime (b) bf16 output above the scoped
    limit, regime (d) dv_alt shrink.  Tie-breaks mirror _plan_flash
    (largest bq*bk, most square, largest bq, mxu_sum variant).  Returns
    None when nothing is feasible (caller falls back to _plan_flash's
    q-padding escape).  At pow2 shapes the zero-padding set contains the
    pow2 ladder, so behavior only changes where there was waste."""
    dvs = [(dv, False)]
    if dv_alt is not None and dv_alt < dv:
        dvs.append((dv_alt, True))
    best = None
    for bq_ in range(256, min(bq_cap, 4096) + 1, 128):
        sq_p = pl.cdiv(sq, bq_) * bq_
        for dv_, alt in dvs:
            out_b = bh * sq_p * dv_ * it
            for bk_ in range(128, min(bk_cap, 2048) + 1, 128):
                sk_p = pl.cdiv(sk, bk_) * bk_
                s = _scoped_vmem(bq_, bk_, dp, dv_, it)
                if s <= VMEM_BUDGET and (out_b > SCOPED_LIMIT
                                         or s + out_b <= VMEM_BUDGET):
                    key = (-(sq_p * sk_p), bq_ * bk_, min(bq_, bk_), bq_,
                           0 if alt else 1)
                    if best is None or key > best[0]:
                        best = (key, bq_, bk_, sq_p, alt)
    if best is None:
        return None
    _, bq_, bk_, sq_p, alt = best
    return bq_, bk_, sq_p, alt


def _padopt_enabled() -> bool:
    import os
    return (os.environ.get("MLIS_FLASH_PADOPT", "0") not in ("0", "false",
                                                             "no")
            and not os.environ.get("MLIS_FLASH_BLOCK"))


def _pad_to(x, axis, size):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention_compatible(q, k, v, causal: bool = False) -> bool:
    """Use flash when the self-attention is big enough to pay off; short-kv
    cross-attention (77 text tokens) can opt in with MLIS_FLASH_CROSS=1
    (the kernel masks the padded kv tail, so kv=77 runs as one 128-wide
    block with logits never leaving VMEM)."""
    if q.ndim != 4 or q.shape[-1] > 512:
        return False
    if k.shape[-2] >= 512 and q.shape[-2] >= 512:
        return True
    import os
    return (q.shape[-2] >= 512 and
            os.environ.get("MLIS_FLASH_CROSS", "0") not in ("0", "false",
                                                            "no"))


def _env_blocks():
    import os
    v = os.environ.get("MLIS_FLASH_BLOCK")
    if v:
        bq, bk = (int(x) for x in v.split(","))
        return bq, bk
    return DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K


@functools.partial(jax.jit,
                   static_argnames=("scale", "causal", "block_q", "block_k"))
def flash_attention(q, k, v, scale=None, causal: bool = False,
                    block_q=None, block_k=None):
    """q: [B,H,Sq,D], k/v: [B,H,Sk,D] -> [B,H,Sq,D].

    Block sizes default to DEFAULT_BLOCK_Q/K, overridable for tuning with
    MLIS_FLASH_BLOCK="bq,bk" (read at trace time; set before first use)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    scale = float(scale)

    # pad head dim to a lane-friendly size and seqs to block multiples.
    # Keep buffers MINIMAL: XLA sometimes places the kernel's output buffer
    # in scoped VMEM (S(1)); linear sizes near the 16MB scoped limit OOM
    # the compile (observed at [16,4096,128] and [1,16384,513] bf16), so
    # never grow the output beyond these long-proven shapes.
    dp = 64 if d <= 64 else (d + 127) // 128 * 128

    env_bq, env_bk = _env_blocks()
    if block_q is None:
        block_q = env_bq
    if block_k is None:
        block_k = env_bk if dp <= 128 else min(env_bk, 1024)
    bq = min(block_q, max(256, 1 << (sq - 1).bit_length()))
    bq = min(bq, block_q)
    bk = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    dv0 = d + 1 if d < dp else dp           # actual output minor (below)
    it = q.dtype.itemsize
    plan = (_plan_flash_padopt(2048, 2048, dp, dv0, it, b * h, sq, sk)
            if not causal and block_q is None and block_k is None
            and _padopt_enabled() else None)
    if plan is None:
        plan = _plan_flash(bq, bk, dp, dv0, it, b * h, sq, causal)
    bq, bk, sq_p, _ = plan
    sk_p = pl.cdiv(sk, bk) * bk

    q = q * (scale * 1.4426950408889634)    # folded scale+log2(e), see kernel
    qp = _pad_to(_pad_to(q.reshape(b * h, sq, d), 2, dp), 1, sq_p)
    kp = _pad_to(_pad_to(k.reshape(b * h, sk, d), 2, dp), 1, sk_p)
    # MXU softmax denominator: a ones column at index d, only when it fits
    # inside the existing dp padding (never grows any buffer).  The default
    # UNet path uses the transposed kernel, so shapes without spare padding
    # here (d==64, d==512) just keep the VPU sum.
    mxu_sum = d < dp
    vr = v.reshape(b * h, sk, d)
    dv = d + 1 if mxu_sum else dp
    if mxu_sum:
        vr = jnp.concatenate([vr, jnp.ones(vr.shape[:2] + (1,), vr.dtype)], 2)
    vp = _pad_to(_pad_to(vr, 2, dv), 1, sk_p)

    kernel = functools.partial(
        _flash_kernel, kv_len=sk, block_k=bk, causal=causal,
        q_len=sq, block_q=bq, mask_tail=(sk_p != sk), d_sum=d,
        single_k=(sk_p == bk), mxu_sum=mxu_sum)

    out = pl.pallas_call(
        kernel,
        grid=(qp.shape[0], sq_p // bq, sk_p // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, bk, dp), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, bk, dv), lambda bh, iq, ik: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dv),
                               lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (qp.shape[0], sq_p, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        # bh and q-blocks are independent; only the k loop carries
        # state — lets Mosaic double-buffer/pipeline the parallel dims
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qp, kp, vp)
    return out[:, :sq, :d].reshape(b, h, sq, d)


# ---------------------------------------------------------------------------
# Transposed-layout variant: v and the output live as [d, seq].
#
# Rationale (docs/BENCH.md round-2 attribution): with the natural layout the
# PV matmul  p[bq,bk] @ v[bk,d]  puts d_head on the MXU lane axis, which pads
# to 128 — 40/128 (SD1) or 64/128 (SDXL) useful output columns.  Computing
# the transpose instead,  accT[d,bq] = vT[d,bk] @ p[bk,bq],  makes d_head the
# MXU *streaming* (sublane) dim which only pads to the 8/16-row tile, and the
# lane axis is the full q block.  The QK contraction padding (d -> 128 depth)
# is intrinsic to the head size and unchanged.  The caller supplies v already
# transposed ([B,H,D,Sk]) and consumes the transposed output ([B,H,D,Sq]) —
# both ends fold into the surrounding projection einsums for free
# (models/blocks.py attn_mhead).
# ---------------------------------------------------------------------------


def _flash_kernel_t(q_ref, k_ref, vt_ref, o_ref, m_scr, l_scr, acc_scr, *,
                    kv_len: int, block_k: int, causal: bool,
                    q_len: int, block_q: int, mask_tail: bool, d_sum: int,
                    single_k: bool, mxu_sum: bool, static_max: bool = False,
                    split_k: int = 1, ablate: str = ""):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]            # [bq, d]  (pre-scaled by scale*log2(e))

    def _p_of(st):
        """Logits -> softmax numerator p (the per-logit VPU/EUP work).

        ``ablate`` (bench-only, MLIS_FLASH_ABLATE) swaps the softmax for
        cheaper stand-ins to attribute kernel time between the MXU
        matmuls and the logits-space passes; numerics are garbage."""
        if ablate == "nosm":        # no softmax at all: straight cast
            return st.astype(vt_ref.dtype)
        if ablate == "noexp":       # mask/clamp pass kept, exp2 removed
            return (jnp.minimum(st, 100.0) * 1e-3).astype(vt_ref.dtype)
        return jnp.exp2(jnp.minimum(st, 100.0)).astype(vt_ref.dtype)

    if static_max and split_k > 1 and not causal:
        # Split-k sub-chains: the block's QK -> exp2 -> PV pipeline is a
        # strict MXU -> VPU -> MXU dependency chain, so the units idle in
        # turn (measured ~17-20%% MXU at d=64).  Cutting the k block into
        # independent sub-chains lets Mosaic's VLIW scheduler overlap
        # sub-chain i's exp2 (VPU/EUP) with sub-chain i+1's QK (MXU).
        # Requires static_max (online max would serialize the chains).
        sub = block_k // split_k
        k_all = k_ref[0]
        pvt_parts = []
        l_parts = []
        for i in range(split_k):
            kk = k_all[i * sub:(i + 1) * sub]
            st = jax.lax.dot_general(
                kk, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mask_tail:
                base = ik * block_k + i * sub

                def _mask(st, base=base):
                    row = (jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
                           + base)
                    return jnp.where(row < kv_len, st, NEG_INF)

                st = jax.lax.cond(
                    jnp.logical_and(ik == nk - 1, base + sub > kv_len),
                    _mask, lambda st: st, st)
            p = _p_of(st)
            if not mxu_sum:
                l_parts.append(jnp.sum(p, axis=0, keepdims=True,
                                       dtype=jnp.float32))
            pvt_parts.append(jax.lax.dot_general(
                vt_ref[0][:, i * sub:(i + 1) * sub], p,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        pvt = functools.reduce(jnp.add, pvt_parts)
        if single_k:
            if mxu_sum:
                l = pvt[d_sum:d_sum + 1, :]
            else:
                l = functools.reduce(jnp.add, l_parts)
            o_ref[0] = (pvt / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            return

        @pl.when(ik == 0)
        def _init_sk():
            acc_scr[:] = jnp.zeros_like(acc_scr)
            if not mxu_sum:
                l_scr[:] = jnp.zeros_like(l_scr)

        if not mxu_sum:
            l_scr[:] = l_scr[:] + functools.reduce(jnp.add, l_parts)
        acc_scr[:] = acc_scr[:] + pvt

        @pl.when(ik == nk - 1)
        def _done_sk():
            acc = acc_scr[:]
            l = (acc[d_sum:d_sum + 1, :] if mxu_sum else l_scr[:])
            o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    k = k_ref[0]            # [bk, d]
    # sT[bk, bq]: kv on sublanes, q on lanes
    st = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0) + ik * block_k
        col = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1) \
            + pl.program_id(1) * block_q
        mask = jnp.logical_and(row < kv_len, row <= col + (kv_len - q_len))
        st = jnp.where(mask, st, NEG_INF)
    elif mask_tail:
        def _mask(st):
            row = (jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
                   + ik * block_k)
            return jnp.where(row < kv_len, st, NEG_INF)

        st = jax.lax.cond(ik == nk - 1, _mask, lambda st: st, st)

    # With mxu_sum, vT carries a ones row at index d_sum: the PV matmul
    # produces the softmax denominator on the MXU (no separate VPU sum
    # pass).  Without it (planner regime (d): the ones row would widen dv
    # by a whole sublane tile and push the output into the S(1) promotion
    # window), the denominator is a [bq] VPU sum carried in l_scr.
    if single_k:
        if static_max:
            p = _p_of(st)
        else:
            m = jnp.max(st, axis=0, keepdims=True)
            p = jnp.exp2(st - m).astype(vt_ref.dtype)
        pvt = jax.lax.dot_general(
            vt_ref[0], p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mxu_sum:
            l = pvt[d_sum:d_sum + 1, :]
        else:
            l = jnp.sum(p, axis=0, keepdims=True, dtype=jnp.float32)
        if static_max:
            # all-underflow guard: a q row whose every logit sits below
            # ~-126 (log2) sums to 0 — emit 0s instead of 0/0 NaN
            l = jnp.maximum(l, 1e-30)
        o_ref[0] = (pvt / l).astype(o_ref.dtype)
        return

    if static_max:
        # No online max: softmax is shift-invariant, so exp2 around 0 is
        # exact as long as nothing overflows — logits are clamped at 100
        # (2^100 * bk * |v| stays far below f32 max in the accumulator;
        # p is bf16 either way, so RELATIVE precision is unchanged; real
        # logits live around |st| <~ 45).  Saves the per-logit max pass,
        # the running-max compare, and the per-block accumulator rescale —
        # the kernel is VPU-(logits-space-)bound, not MXU-bound.
        @pl.when(ik == 0)
        def _init_sm():
            acc_scr[:] = jnp.zeros_like(acc_scr)
            if not mxu_sum:
                l_scr[:] = jnp.zeros_like(l_scr)

        p = _p_of(st)
        if not mxu_sum:
            l_scr[:] = l_scr[:] + jnp.sum(
                p, axis=0, keepdims=True, dtype=jnp.float32)
        pvt = jax.lax.dot_general(
            vt_ref[0], p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] + pvt

        @pl.when(ik == nk - 1)
        def _done_sm():
            acc = acc_scr[:]
            l = (acc[d_sum:d_sum + 1, :] if mxu_sum else l_scr[:])
            # all-underflow guard (see single_k branch)
            o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if not mxu_sum:
            l_scr[:] = jnp.zeros_like(l_scr)

    m_prev = m_scr[:]                       # [1, bq]
    m_cur = jnp.max(st, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)        # [1, bq]
    # p materializes directly in the v dtype (bf16 on the hot path): halves
    # the bytes of the PV input; f32 inputs keep f32 p
    p = jnp.exp2(st - m_new).astype(vt_ref.dtype)  # [bk, bq]

    m_scr[:] = m_new
    if not mxu_sum:
        l_scr[:] = l_scr[:] * alpha + jnp.sum(
            p, axis=0, keepdims=True, dtype=jnp.float32)
    # accT[d, bq] = vT[d, bk] @ p[bk, bq]: d streams on sublanes (no 128 pad)
    pvt = jax.lax.dot_general(
        vt_ref[0], p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pvt

    @pl.when(ik == nk - 1)
    def _done():
        acc = acc_scr[:]
        l = (acc[d_sum:d_sum + 1, :] if mxu_sum else l_scr[:])
        o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention_t(q, k, vt, scale=None, causal: bool = False,
                      block_q=None, block_k=None, static_max=None):
    """Transposed-v flash attention.

    q: [B,H,Sq,D], k: [B,H,Sk,D], vt: [B,H,D,Sk] -> [B,H,D,Sq].
    Same online softmax as :func:`flash_attention`; the PV product and the
    output are transposed so d_head sits on MXU sublanes instead of lanes.
    ``static_max=True`` (DEFAULT since round 4 — queue #15 measured it a
    consistent 3-6%% step win with on-HW numerics green; opt out with
    MLIS_FLASH_STATICMAX=0.  Resolved HERE so it becomes an explicit jit
    static arg — flipping the env between calls retraces instead of
    silently hitting the old cache entry) drops the online-max
    bookkeeping — see the kernel comment.  MLIS_FLASH_SPLITK=N (with
    static_max) cuts each k block into N independent QK->exp2->PV
    sub-chains so Mosaic can overlap MXU and VPU/EUP work across chains;
    MLIS_FLASH_ABLATE=noexp|nosm is a bench-only softmax stand-in for
    time attribution (garbage numerics).
    """
    import os
    if static_max is None:
        static_max = os.environ.get(
            "MLIS_FLASH_STATICMAX", "1") not in ("0", "false", "no")
    split_k = int(os.environ.get("MLIS_FLASH_SPLITK", "1") or "1")
    ablate = os.environ.get("MLIS_FLASH_ABLATE", "")
    return _flash_attention_t_jit(q, k, vt, scale=scale, causal=causal,
                                  block_q=block_q, block_k=block_k,
                                  static_max=bool(static_max),
                                  split_k=split_k, ablate=ablate)


@functools.partial(jax.jit,
                   static_argnames=("scale", "causal", "block_q", "block_k",
                                    "static_max", "split_k", "ablate"))
def _flash_attention_t_jit(q, k, vt, scale=None, causal: bool = False,
                           block_q=None, block_k=None, static_max=False,
                           split_k=1, ablate=""):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    assert vt.shape == (b, h, d, sk), (vt.shape, (b, h, d, sk))
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    scale = float(scale)

    # d pads only to the sublane tile (16 covers bf16/f32 operands)
    dp = (d + 15) // 16 * 16

    env_bq, env_bk = _env_blocks()
    if block_q is None:
        block_q = env_bq
    if block_k is None:
        block_k = env_bk
    bq = min(block_q, max(256, 1 << (sq - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    dv0 = (d + 1 + 15) // 16 * 16           # with the MXU-sum ones row
    dv_alt = (d + 15) // 16 * 16            # bare sublane tile (regime (d))
    it = q.dtype.itemsize
    plan = (_plan_flash_padopt(2048, 2048, dp, dv0, it, b * h, sq, sk,
                               dv_alt=dv_alt)
            if not causal and block_q is None and block_k is None
            and _padopt_enabled() else None)
    if plan is None:
        plan = _plan_flash(bq, bk, dp, dv0, it, b * h, sq, causal,
                           dv_alt=dv_alt)
    bq, bk, sq_p, alt = plan
    mxu_sum = not alt
    sk_p = pl.cdiv(sk, bk) * bk

    q = q * (scale * 1.4426950408889634)    # folded scale+log2(e), see kernel
    qp = _pad_to(_pad_to(q.reshape(b * h, sq, d), 2, dp), 1, sq_p)
    kp = _pad_to(_pad_to(k.reshape(b * h, sk, d), 2, dp), 1, sk_p)
    # ones row at index d: PV also produces the softmax denominator
    # (kernel); dropped when the planner shrank dv to keep the output out
    # of the S(1) promotion window
    vtr = vt.reshape(b * h, d, sk)
    if mxu_sum:
        vtr = jnp.concatenate(
            [vtr, jnp.ones((b * h, 1, sk), vtr.dtype)], 1)
    dv = dv_alt if alt else dv0             # sublane-tile padded rows
    vtp = _pad_to(_pad_to(vtr, 1, dv), 2, sk_p)

    if split_k > 1 and (bk % split_k != 0 or (bk // split_k) % 128 != 0
                        or not static_max):
        split_k = 1                         # sub-chains must stay tile-aligned
    kernel = functools.partial(
        _flash_kernel_t, kv_len=sk, block_k=bk, causal=causal,
        q_len=sq, block_q=bq, mask_tail=(sk_p != sk), d_sum=d,
        single_k=(sk_p == bk), mxu_sum=mxu_sum, static_max=static_max,
        split_k=split_k, ablate=ablate)

    out = pl.pallas_call(
        kernel,
        grid=(qp.shape[0], sq_p // bq, sk_p // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, bk, dp), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, dv, bk), lambda bh, iq, ik: (bh, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, dv, bq),
                               lambda bh, iq, ik: (bh, 0, iq)),
        out_shape=jax.ShapeDtypeStruct(
            (qp.shape[0], dv, sq_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((dv, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qp, kp, vtp)
    return out[:, :d, :sq].reshape(b, h, d, sq)
