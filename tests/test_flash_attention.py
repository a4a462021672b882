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


def test_danger_chunks_math():
    """Outputs in the S(1) promotion window split along bh so every chunk
    lands below DANGER_LO; outside the window no split happens."""
    per = 2 * 1024 * 1024
    assert fa._danger_chunks(4, per, 4 * per) is None  # 8M: below window
    ch = fa._danger_chunks(10, per, 10 * per)          # 20M: in window
    assert ch is not None
    assert ch[0][0] == 0 and ch[-1][1] == 10
    for s, e in ch:
        assert (e - s) * per < fa.DANGER_LO
        assert e > s
    # contiguous cover
    for (s1, e1), (s2, e2) in zip(ch, ch[1:]):
        assert e1 == s2
    # above the window: treated safe, no split
    assert fa._danger_chunks(32, per, 32 * per) is None
    # bh == 1 cannot split
    assert fa._danger_chunks(1, 12 * per, 12 * per) is None


def test_danger_split_keeps_full_blocks(monkeypatch):
    """The SD2-768 L0 shape (output 14.2M, previously clamped) now splits
    into sub-window chunks and keeps the full-speed (2048,1024) blocks."""
    calls = []

    def capture(kernel, *a, grid=None, in_specs=None, out_shape=None, **kw):
        calls.append((grid, in_specs[0].block_shape, out_shape))
        return lambda *operands: jnp.zeros(out_shape.shape, out_shape.dtype)

    monkeypatch.setattr(fa.pl, "pallas_call", capture)
    b, h, s, d = 2, 5, 9216, 64           # SD2-768 level-0 self-attention
    q = rand(b, h, s, d, seed=2).astype(jnp.bfloat16) * 0.3
    fa.flash_attention_t(q, q, q.swapaxes(-1, -2))
    assert len(calls) >= 2, "danger-window shape did not split"
    it = 2
    total_rows = 0
    for grid, qblk, out_shape in calls:
        out_bytes = int(np.prod(out_shape.shape)) * it
        assert out_bytes < fa.DANGER_LO, out_bytes
        assert qblk[1] == 2048, f"blocks clamped to {qblk} despite split"
        total_rows += out_shape.shape[0]
    assert total_rows == b * h


def test_danger_split_numerics(monkeypatch):
    """Splitting must be numerically invisible: shrink the window so a
    small shape splits, compare against the XLA reference."""
    monkeypatch.setattr(fa, "DANGER_LO", 64 * 1024)
    monkeypatch.setattr(fa, "DANGER_HI", 64 * 1024 * 1024)
    from mlimgsynth_tpu.ops.attention import attention_xla
    q = rand(2, 4, 640, 64, seed=3) * 0.3
    k = rand(2, 4, 640, 64, seed=4) * 0.3
    v = rand(2, 4, 640, 64, seed=5) * 0.3
    assert fa._danger_chunks(8, 640 * 80 * 4, 8 * 640 * 80 * 4) is not None
    got = np.asarray(fa.flash_attention(q, k, v))
    ref = np.asarray(attention_xla(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    got_t = np.asarray(fa.flash_attention_t(q, k, v.swapaxes(-1, -2)))
    np.testing.assert_allclose(got_t.swapaxes(-1, -2), ref, atol=2e-5)


def test_vmem_budget_clamp(monkeypatch):
    """Kernel VMEM (f32 logits + operand tiles + f32 acc) must stay under
    ~10MB for every shape the models use: unclamped blocks OOM XLA's
    scoped-vmem stack at compile time (docs/BENCH.md round-2).  Captures
    the actual grid/block sizes by intercepting pallas_call."""
    captured = {}

    def capture(kernel, *a, grid=None, in_specs=None, out_shape=None, **kw):
        captured["q"] = in_specs[0].block_shape
        captured["k"] = in_specs[1].block_shape
        captured["v"] = in_specs[2].block_shape
        # block geometry is fully decided before the call — skip executing
        # the kernel (interpret mode at these shapes costs a minute)
        return lambda *operands: jnp.zeros(out_shape.shape, out_shape.dtype)

    monkeypatch.setattr(fa.pl, "pallas_call", capture)
    shapes = [
        (2, 8, 4096, 40),     # SD1.5
        (2, 10, 4096, 64),    # SDXL L1
        (2, 10, 2304, 64),    # SD2-768 L1 (S(1) danger zone output)
        (1, 1, 4096, 512),    # VAE mid (wide head)
        (8, 1, 4096, 512),    # VAE mid, batch 8 (windows alone near 16M)
    ]
    for b, h, s, d in shapes:
        q = rand(b, h, s, d, seed=1).astype(jnp.bfloat16) * 0.3
        for fn, v in ((fa.flash_attention, q),
                      (fa.flash_attention_t, q.swapaxes(-1, -2))):
            captured.clear()
            fn(q, q, v)
            (_, bq, dp) = captured["q"]
            (_, b1, b2) = captured["v"]
            if fn is fa.flash_attention:
                bk, dv = b1, b2
            else:
                dv, bk = b1, b2
            vmem = fa._scoped_vmem(bq, bk, dp, dv, 2)
            assert vmem <= 15.5 * 1024 * 1024, (fn.__name__, b, h, s, d,
                                                vmem)
