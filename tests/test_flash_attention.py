"""Flash-attention kernel vs the XLA reference path (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.ops import flash_attention as fa
from mlimgsynth_tpu.ops.attention import attention_xla


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        import jax.experimental.pallas.tpu as pltpu  # noqa
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("sq,sk,d", [
    (512, 512, 64),
    (1024, 1024, 40),    # SD1 d_head=40 (padded to 64 internally)
    (513, 512, 64),      # ragged q
    (512, 600, 64),      # ragged kv
    (768, 768, 128),
])
def test_matches_xla(sq, sk, d):
    q = rand(1, 2, sq, d, seed=1) * 0.5
    k = rand(1, 2, sk, d, seed=2) * 0.5
    v = rand(1, 2, sk, d, seed=3)
    out = fa.flash_attention(q, k, v, block_q=256, block_k=256)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_causal_matches_xla():
    q = rand(1, 1, 512, 64, seed=1) * 0.5
    k = rand(1, 1, 512, 64, seed=2) * 0.5
    v = rand(1, 1, 512, 64, seed=3)
    out = fa.flash_attention(q, k, v, causal=True, block_q=256, block_k=256)
    ref = attention_xla(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_bf16_inputs():
    q = rand(1, 2, 512, 64, seed=1).astype(jnp.bfloat16)
    k = rand(1, 2, 512, 64, seed=2).astype(jnp.bfloat16)
    v = rand(1, 2, 512, 64, seed=3).astype(jnp.bfloat16)
    out = fa.flash_attention(q, k, v, block_q=256, block_k=256)
    assert out.dtype == jnp.bfloat16
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


@pytest.mark.parametrize("sq,sk,d", [
    (512, 512, 64),
    (1024, 1024, 40),    # SD1 d_head=40 (pads to 48 sublanes only)
    (513, 512, 64),      # ragged q
    (512, 600, 64),      # ragged kv (tail-block masking path)
    (768, 768, 128),
])
def test_transposed_matches_xla(sq, sk, d):
    q = rand(1, 2, sq, d, seed=1) * 0.5
    k = rand(1, 2, sk, d, seed=2) * 0.5
    v = rand(1, 2, sk, d, seed=3)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                 block_q=256, block_k=256)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2)),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("sq,sk,d", [
    (512, 512, 64),
    (512, 600, 64),      # ragged kv (tail masking composes with exp2(st))
    (513, 512, 40),      # ragged q + single-k-block fast path
])
def test_transposed_static_max_matches_xla(sq, sk, d):
    """static_max drops the online-max bookkeeping; softmax shift
    invariance must make it numerically identical at realistic logit
    magnitudes (incl. bf16 p precision)."""
    q = rand(1, 2, sq, d, seed=1) * 0.5
    k = rand(1, 2, sk, d, seed=2) * 0.5
    v = rand(1, 2, sk, d, seed=3)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                 block_q=256, block_k=256, static_max=True)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2)),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_transposed_static_max_bf16():
    q = rand(1, 2, 512, 64, seed=1).astype(jnp.bfloat16)
    k = rand(1, 2, 512, 64, seed=2).astype(jnp.bfloat16)
    v = rand(1, 2, 512, 64, seed=3).astype(jnp.bfloat16)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                 block_q=256, block_k=256, static_max=True)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2), np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_transposed_causal_matches_xla():
    q = rand(1, 1, 512, 64, seed=1) * 0.5
    k = rand(1, 1, 512, 64, seed=2) * 0.5
    v = rand(1, 1, 512, 64, seed=3)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2), causal=True,
                                 block_q=256, block_k=256)
    ref = attention_xla(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2)),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_transposed_bf16():
    q = rand(1, 2, 512, 40, seed=1).astype(jnp.bfloat16)
    k = rand(1, 2, 512, 40, seed=2).astype(jnp.bfloat16)
    v = rand(1, 2, 512, 40, seed=3).astype(jnp.bfloat16)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                 block_q=256, block_k=256)
    assert out_t.dtype == jnp.bfloat16
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2), np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_attention_t_dispatch_fallback():
    """attention_t falls back to the XLA path (transposing around it) when
    flash is unavailable (e.g. CPU backend with default env)."""
    from mlimgsynth_tpu.ops import attention as am
    q = rand(1, 2, 512, 40, seed=1) * 0.5
    k = rand(1, 2, 512, 40, seed=2) * 0.5
    v = rand(1, 2, 512, 40, seed=3)
    out = am.attention_t(q, k, v.swapaxes(-1, -2))
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out.swapaxes(-1, -2)),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_compatibility_gate():
    # short-kv cross attention stays on XLA
    assert not fa.flash_attention_compatible(
        jnp.zeros((1, 8, 4096, 40)), jnp.zeros((1, 8, 77, 40)),
        jnp.zeros((1, 8, 77, 40)))
    assert fa.flash_attention_compatible(
        jnp.zeros((1, 8, 4096, 40)), jnp.zeros((1, 8, 4096, 40)),
        jnp.zeros((1, 8, 4096, 40)))
    # 77-token CLIP attention stays on XLA
    assert not fa.flash_attention_compatible(
        jnp.zeros((1, 12, 77, 64)), jnp.zeros((1, 12, 77, 64)),
        jnp.zeros((1, 12, 77, 64)), causal=True)


def test_plan_flash_math():
    """_plan_flash (round-3 revision 3): every plan lands in one of the
    deterministic-safe regimes — (a) stack + FULL output <= budget,
    (b) bf16 output > SCOPED_LIMIT (never promoted, in-loop evidence at
    32-48 MiB), or (d) the dv_alt (no-MXU-sum) output minor that shrinks
    the output back into regime (a) — with the q axis padded into (b)
    only when nothing else is reachable."""
    it = 2

    def out_bytes(bh, sq_p, dv):
        return bh * sq_p * dv * it

    # small: full blocks kept, fits with output resident, MXU sum kept
    bq, bk, sq_p, alt = fa._plan_flash(1024, 1024, 64, 80, it, 4, 1024,
                                       False, dv_alt=64)
    assert (bq, bk, alt) == (1024, 1024, False) and sq_p == 1024
    assert (fa._scoped_vmem(bq, bk, 64, 80, it) + out_bytes(4, sq_p, 80)
            <= fa.VMEM_BUDGET)
    # SD2-768 L1 (the round-3 in-loop OOM shape): regime (a); the
    # fewest-rows preference cuts the q padding (2304 -> 2560)
    bq, bk, sq_p, alt = fa._plan_flash(2048, 2048, 64, 80, it, 20, 2304,
                                       False, dv_alt=64)
    assert sq_p <= 2560, sq_p
    dv = 64 if alt else 80
    assert (fa._scoped_vmem(bq, bk, 64, dv, it) + out_bytes(20, sq_p, dv)
            <= fa.VMEM_BUDGET)
    # SD2-768 L0: the dv=80 output sits just UNDER the hard limit and no
    # blocks can absorb it -> regime (d): dv=64 reaches (a) with ZERO q
    # padding (9216 is 512/1024-aligned) — the v3 plan padded to 10752
    bq, bk, sq_p, alt = fa._plan_flash(2048, 2048, 64, 80, it, 10, 9216,
                                       False, dv_alt=64)
    assert alt and sq_p == 9216, (bq, bk, sq_p, alt)
    assert (fa._scoped_vmem(bq, bk, 64, 64, it) + out_bytes(10, sq_p, 64)
            <= fa.VMEM_BUDGET)
    # SDXL L1 (b2 h10 s4096 d64): regime (d) — no padding, (a)-safe
    bq, bk, sq_p, alt = fa._plan_flash(2048, 1024, 64, 80, it, 20, 4096,
                                       False, dv_alt=64)
    assert alt and sq_p == 4096 and bq * bk >= 512 * 1024, (
        bq, bk, sq_p, alt)
    assert (fa._scoped_vmem(bq, bk, 64, 64, it) + out_bytes(20, sq_p, 64)
            <= fa.VMEM_BUDGET)
    # VAE-1024 (wide head): output alone exceeds the hard limit ->
    # regime (b), stack-only constraint
    bq, bk, sq_p, alt = fa._plan_flash(2048, 1024, 512, 513, it, 1, 16384,
                                       False)
    assert out_bytes(1, sq_p, 513) > fa.SCOPED_LIMIT
    assert fa._scoped_vmem(bq, bk, 512, 513, it) <= fa.VMEM_BUDGET


def test_padded_q_numerics(monkeypatch):
    """The unpromotable-by-padding fallback must be numerically invisible:
    shrink SCOPED_LIMIT/budget so a small shape takes the padding path,
    compare against the XLA reference."""
    from mlimgsynth_tpu.ops.attention import attention_xla
    it = 4
    stack = fa._scoped_vmem(512, 512, 64, 80, it)
    monkeypatch.setattr(fa, "VMEM_BUDGET", stack + 1024)
    monkeypatch.setattr(fa, "SCOPED_LIMIT",
                        4 * 2048 * 80 * it + 512 * 80 * it)  # forces +pad
    q = rand(2, 2, 2048, 64, seed=3) * 0.3
    k = rand(2, 2, 2048, 64, seed=4) * 0.3
    v = rand(2, 2, 2048, 64, seed=5) * 0.3
    bq, bk, sq_p, _ = fa._plan_flash(512, 512, 64, 80, it, 4, 2048, False)
    assert sq_p > 2048, "padding path not taken"
    # (the wrappers also pass dv_alt; keep this case in the pure-pad
    # regime by monkeypatched limits either way)
    ref = np.asarray(attention_xla(q, k, v))
    got = np.asarray(fa.flash_attention(q, k, v, block_q=512, block_k=512))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    got_t = np.asarray(fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                            block_q=512, block_k=512))
    np.testing.assert_allclose(got_t.swapaxes(-1, -2), ref, atol=2e-5)


def test_vpu_sum_variant_numerics(monkeypatch):
    """Regime (d) — the no-MXU-sum transposed kernel (dv shrunk to the
    bare sublane tile) — must be numerically invisible: shrink the
    planner budget so a small bf16 d=64 shape takes the dv_alt path,
    compare against the XLA reference."""
    plans = []
    orig = fa._plan_flash

    def spy(*a, **kw):
        plan = orig(*a, **kw)
        plans.append(plan)
        return plan

    monkeypatch.setattr(fa, "_plan_flash", spy)
    it = 2
    q = (rand(2, 2, 1024, 64, seed=7) * 0.3).astype(jnp.bfloat16)
    k = (rand(2, 2, 1024, 64, seed=8) * 0.3).astype(jnp.bfloat16)
    v = (rand(2, 2, 1024, 64, seed=9) * 0.3).astype(jnp.bfloat16)
    ref = np.asarray(attention_xla(q, k, v), np.float32)
    # budget window: dv=80 (MXU sum) misses regime (a) at every block
    # while dv=64 (VPU sum) fits at (512,256) with the output resident
    out64 = 4 * 1024 * 64 * it
    monkeypatch.setattr(
        fa, "VMEM_BUDGET",
        fa._scoped_vmem(512, 256, 64, 64, it) + out64 + 1024)
    monkeypatch.setattr(fa, "SCOPED_LIMIT", 1 << 60)  # no (b) escape
    got = fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                               block_q=512, block_k=512)
    assert plans and plans[-1][3] is True, plans  # dv_alt taken
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got.swapaxes(-1, -2), np.float32), ref, atol=3e-2)


def test_vmem_invariant_all_model_shapes(monkeypatch):
    """Every pallas_call the wrappers emit must satisfy the revised
    always-promoted invariant for every model shape:
    stack <= VMEM_BUDGET and (output > SCOPED_LIMIT or
    stack + output <= VMEM_BUDGET).  Chunked calls are gone — each
    invocation is exactly ONE pallas_call (chunk outputs all stayed live
    until the stitch, so chunking never reduced the S(1) peak)."""
    calls = []

    def capture(kernel, *a, grid=None, in_specs=None, out_shape=None, **kw):
        calls.append((in_specs[0].block_shape, in_specs[1].block_shape,
                      in_specs[2].block_shape, out_shape))
        return lambda *operands: jnp.zeros(out_shape.shape, out_shape.dtype)

    monkeypatch.setattr(fa.pl, "pallas_call", capture)
    shapes = [
        (2, 8, 4096, 40),     # SD1.5
        (2, 10, 4096, 64),    # SDXL L1
        (2, 10, 2304, 64),    # SD2-768 L1 (the round-3 in-loop OOM shape)
        (2, 5, 9216, 64),     # SD2-768 L0 (padding-fallback regime)
        (2, 20, 1024, 64),    # SDXL L2 (single-k fast path)
        (1, 1, 4096, 512),    # VAE mid (wide head)
        (1, 1, 9216, 512),    # VAE mid at 768px
        (1, 1, 16384, 512),   # VAE mid at 1024px (unpromotable output)
        (8, 1, 4096, 512),    # VAE mid, batch 8
        (16, 8, 4096, 40),    # SD1.5 batch-8
    ]
    for b, h, s, d in shapes:
        q = rand(b, h, s, d, seed=1).astype(jnp.bfloat16) * 0.3
        for fn, v in ((fa.flash_attention, q),
                      (fa.flash_attention_t, q.swapaxes(-1, -2))):
            calls.clear()
            fn(q, q, v)
            assert len(calls) == 1, (fn.__name__, b, h, s, d, len(calls))
            qblk, kblk, vblk, out_shape = calls[0]
            (_, bq, dp) = qblk
            if fn is fa.flash_attention:
                bk, dv = vblk[1], vblk[2]
            else:
                dv, bk = vblk[1], vblk[2]
            # outputs always keep the input dtype: f32 pallas outputs get
            # S(1)-promoted regardless of size (falsified regime (c))
            out_it = jnp.dtype(out_shape.dtype).itemsize
            assert out_it == 2, (fn.__name__, b, h, s, d, out_shape.dtype)
            vmem = fa._scoped_vmem(bq, bk, dp, dv, 2)
            out_b = int(np.prod(out_shape.shape)) * out_it
            assert vmem <= fa.VMEM_BUDGET, (fn.__name__, b, h, s, d, vmem)
            assert (out_b > fa.SCOPED_LIMIT
                    or vmem + out_b <= fa.VMEM_BUDGET), (
                fn.__name__, b, h, s, d, vmem, out_b)



def test_plan_flash_padopt_geometry():
    """Padding-aware planner: non-pow2 joint-attention shapes get
    (near-)zero-padding block geometry; pow2 shapes stay exact."""
    from jax.experimental import pallas as pl

    # SD3 joint attention: S=4250 -> 4352x4352 (4.9% logits waste vs the
    # pow2 ladder's 23%)
    bq, bk, sq_p, alt = fa._plan_flash_padopt(2048, 2048, 64, 80, 2,
                                              48, 4250, 4250, dv_alt=64)
    assert sq_p == 4352
    assert pl.cdiv(4250, bk) * bk == 4352
    # SD2-768 L1: S=2304 = 2^8*9 -> exact fit, zero padding (the pow2
    # ladder pads 48%)
    bq, bk, sq_p, alt = fa._plan_flash_padopt(2048, 2048, 64, 80, 2,
                                              16, 2304, 2304, dv_alt=64)
    assert sq_p == 2304
    assert pl.cdiv(2304, bk) * bk == 2304
    # pow2 (SD1.5-512): nothing to gain, stays exact with large blocks
    bq, bk, sq_p, alt = fa._plan_flash_padopt(2048, 2048, 48, 64, 2,
                                              16, 4096, 4096, dv_alt=48)
    assert sq_p == 4096
    assert pl.cdiv(4096, bk) * bk == 4096
    assert bq * bk >= 512 * 512


def test_padopt_matches_xla(monkeypatch):
    """MLIS_FLASH_PADOPT=1 end-to-end numerics at a non-pow2 shape."""
    monkeypatch.setenv("MLIS_FLASH_PADOPT", "1")
    q = rand(1, 2, 600, 64, seed=1) * 0.5
    k = rand(1, 2, 600, 64, seed=2) * 0.5
    v = rand(1, 2, 600, 64, seed=3)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2))
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2)),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("sq,sk,d,split", [
    (512, 600, 64, 2),     # ragged kv: per-sub-chain tail masking
    (512, 512, 64, 2),     # single-k fast path (sk_p == bk == 512)
    (513, 1024, 64, 4),    # ragged q, multi-k accumulation
])
def test_transposed_split_k_matches_xla(sq, sk, d, split, monkeypatch):
    """MLIS_FLASH_SPLITK cuts each k block into independent sub-chains
    (MXU/VPU overlap); the result must match the unsplit kernel/XLA."""
    monkeypatch.setenv("MLIS_FLASH_SPLITK", str(split))
    q = rand(1, 2, sq, d, seed=1) * 0.5
    k = rand(1, 2, sk, d, seed=2) * 0.5
    v = rand(1, 2, sk, d, seed=3)
    out_t = fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                 block_q=256, block_k=512, static_max=True)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_t.swapaxes(-1, -2)),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)
