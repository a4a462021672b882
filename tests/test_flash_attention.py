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
    """_plan_flash: whole-output fit -> no split; otherwise bh chunks, then
    q chunks, always with stack + chunk <= VMEM_BUDGET."""
    it = 2
    # small: whole output fits
    bq, bk, sq_p, rows, qstep = fa._plan_flash(1024, 1024, 64, 80, it,
                                               4, 1024, False)
    assert rows == 0 and qstep == 0
    # SD2-768 L0: bh chunks at full blocks
    bq, bk, sq_p, rows, qstep = fa._plan_flash(2048, 1024, 64, 80, it,
                                               10, 9216, False)
    assert (bq, bk) == (2048, 1024) and rows >= 1 and qstep == 0
    assert (fa._scoped_vmem(bq, bk, 64, 80, it) + rows * sq_p * 80 * it
            <= fa.VMEM_BUDGET)
    # huge single row: q chunks (non-causal only)
    bq, bk, sq_p, rows, qstep = fa._plan_flash(1024, 1024, 512, 528, it,
                                               1, 16384, False)
    assert rows == 1 and qstep > 0 and qstep % bq == 0
    assert (fa._scoped_vmem(bq, bk, 512, 528, it) + qstep * 528 * it
            <= fa.VMEM_BUDGET)


def test_split_keeps_full_blocks(monkeypatch):
    """The SD2-768 L0 shape (14.2M output, previously block-clamped) splits
    into chunks and keeps the full-speed (2048,1024) blocks, with every
    call safe under the always-promoted policy."""
    calls = []

    def capture(kernel, *a, grid=None, in_specs=None, out_shape=None, **kw):
        calls.append((grid, in_specs[0].block_shape, out_shape))
        return lambda *operands: jnp.zeros(out_shape.shape, out_shape.dtype)

    monkeypatch.setattr(fa.pl, "pallas_call", capture)
    b, h, s, d = 2, 5, 9216, 64           # SD2-768 level-0 self-attention
    q = rand(b, h, s, d, seed=2).astype(jnp.bfloat16) * 0.3
    fa.flash_attention_t(q, q, q.swapaxes(-1, -2))
    assert len(calls) >= 2, "over-budget shape did not split"
    it = 2
    total_rows = 0
    for grid, qblk, out_shape in calls:
        (_, bq, dp) = qblk
        out_bytes = int(np.prod(out_shape.shape)) * it
        assert qblk[1] == 2048, f"blocks clamped to {qblk} despite split"
        total_rows += out_shape.shape[0]
    assert total_rows == b * h


def test_split_numerics(monkeypatch):
    """Output chunking (bh AND q axis) must be numerically invisible:
    shrink the budget so a small shape splits both ways, compare against
    the XLA reference."""
    monkeypatch.setattr(fa, "VMEM_BUDGET", fa._scoped_vmem(
        512, 512, 64, 80, 4) + 512 * 80 * 4 * 2)  # ~2 q-blocks allowed
    from mlimgsynth_tpu.ops.attention import attention_xla
    q = rand(2, 2, 2048, 64, seed=3) * 0.3
    k = rand(2, 2, 2048, 64, seed=4) * 0.3
    v = rand(2, 2, 2048, 64, seed=5) * 0.3
    bq, bk, sq_p, rows, qstep = fa._plan_flash(
        512, 512, 64, 80, 4, 4, 2048, False)
    assert rows == 1 and qstep > 0, (rows, qstep)
    ref = np.asarray(attention_xla(q, k, v))
    got = np.asarray(fa.flash_attention(q, k, v, block_q=512, block_k=512))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    got_t = np.asarray(fa.flash_attention_t(q, k, v.swapaxes(-1, -2),
                                            block_q=512, block_k=512))
    np.testing.assert_allclose(got_t.swapaxes(-1, -2), ref, atol=2e-5)


def test_vmem_budget_always_promoted(monkeypatch):
    """Every pallas_call the wrappers emit must satisfy the always-promoted
    invariant: _scoped_vmem(blocks) + output_chunk_bytes <= VMEM_BUDGET for
    every model shape.  Captures block geometry by intercepting
    pallas_call (the S(1) output promotion is unpredictable, so the only
    deterministic-safe policy is counting every output)."""
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
        (2, 5, 9216, 64),     # SD2-768 L0
        (1, 1, 4096, 512),    # VAE mid (wide head)
        (1, 1, 16384, 512),   # VAE mid at 1024px (q-axis chunking)
        (8, 1, 4096, 512),    # VAE mid, batch 8
        (16, 8, 4096, 40),    # SD1.5 batch-8
    ]
    for b, h, s, d in shapes:
        q = rand(b, h, s, d, seed=1).astype(jnp.bfloat16) * 0.3
        for fn, v in ((fa.flash_attention, q),
                      (fa.flash_attention_t, q.swapaxes(-1, -2))):
            calls.clear()
            fn(q, q, v)
            total = 0
            for qblk, kblk, vblk, out_shape in calls:
                (_, bq, dp) = qblk
                if fn is fa.flash_attention:
                    bk, dv = vblk[1], vblk[2]
                else:
                    dv, bk = vblk[1], vblk[2]
                vmem = fa._scoped_vmem(bq, bk, dp, dv, 2)
                out_bytes = int(np.prod(out_shape.shape)) * 2
                assert vmem + out_bytes <= fa.VMEM_BUDGET, (
                    fn.__name__, b, h, s, d, vmem, out_bytes)
                total += int(np.prod(out_shape.shape))

