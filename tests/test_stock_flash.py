"""Stock-kernel dispatch path (ops/stock_flash) vs the XLA reference.

The large-S self-attention regime routes through the stock JAX pallas
TPU flash kernel (docs/BENCH.md queue #22); these tests pin the wrapper
numerics (kv padding + segment-ids masking, ragged q), the eligibility
gates, and that attention() actually dispatches there under force mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.ops import attention as att
from mlimgsynth_tpu.ops import stock_flash as sf
from mlimgsynth_tpu.ops.attention import attention, attention_xla


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def rand(*shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("s,d", [
    (256, 64),       # kv padded 256->512: segment-ids mask path
    (512, 64),       # dividing: no segids
    (640, 32),       # 640 -> block 128
    (300, 64),       # ragged q AND padded kv
    (256, 256),      # wide head (d > 128, lane-multiple): VAE-attn regime
])
def test_stock_wrapper_matches_xla(s, d):
    q = rand(1, 2, s, d, seed=1) * 0.5
    k = rand(1, 2, s, d, seed=2) * 0.5
    v = rand(1, 2, s, d, seed=3)
    out = sf.stock_flash(q, k, v)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_attention_dispatches_stock(monkeypatch):
    """Under force mode the dispatch layer must route eligible shapes to
    the stock wrapper (pinned by counting wrapper calls)."""
    monkeypatch.setenv("MLIS_FLASH_STOCK", "force")
    monkeypatch.setenv("MLIS_FLASH_ATTENTION", "1")
    calls = []
    orig = sf.stock_flash
    monkeypatch.setattr(sf, "stock_flash",
                        lambda *a, **kw: calls.append(1) or orig(*a, **kw))
    q = rand(1, 2, 256, 64, seed=1) * 0.5
    k = rand(1, 2, 256, 64, seed=2) * 0.5
    v = rand(1, 2, 256, 64, seed=3)
    out = attention(q, k, v)
    assert calls, "stock path not taken under MLIS_FLASH_STOCK=force"
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_eligibility_gates():
    q64 = jnp.zeros((2, 24, 4250, 64), jnp.bfloat16)
    big = (q64, q64, q64)
    assert sf.eligible(*big, False)                 # SD3 shape: 26 MiB out
    assert not sf.eligible(*big, True)              # causal unsupported
    # cross attention (sq != sk)
    k77 = jnp.zeros((2, 24, 77, 64), jnp.bfloat16)
    assert not sf.eligible(q64, k77, k77, False)
    # small-S regime stays on our kernel
    small = jnp.zeros((2, 8, 1024, 64), jnp.bfloat16)
    assert not sf.eligible(small, small, small, False)
    # SDXL L1 batch-2 (10 MiB out): q-pad to safety would cost 63% extra
    # rows (> the 35% bound) -> ineligible, stays on our kernel
    sdxl = jnp.zeros((2, 10, 4096, 64), jnp.bfloat16)
    assert not sf.eligible(sdxl, sdxl, sdxl, False)
    # sd3-turbo batch-1 (13 MiB out): reachable by a 29% q pad -> eligible
    turbo = jnp.zeros((1, 24, 4250, 64), jnp.bfloat16)
    assert sf.eligible(turbo, turbo, turbo, False)
    # f32 is never auto-eligible (S(1)-placement above 16 MiB, r3 finding)
    assert not sf.eligible(*(sdxl.astype(jnp.float32),) * 3, False)
    # d not a lane multiple above 128
    d160 = jnp.zeros((2, 24, 4250, 160), jnp.bfloat16)
    assert not sf.eligible(d160, d160, d160, False)
    # off switch
    import os
    os.environ["MLIS_FLASH_STOCK"] = "0"
    try:
        assert not sf.eligible(*big, False)
    finally:
        del os.environ["MLIS_FLASH_STOCK"]


def test_mesh_shrinks_gate():
    """Under a mesh the promotion gate must use the per-device block:
    global SD3 shape is eligible single-device but NOT at tp=8 (heads
    axis / 8 -> 3.3 MiB out, promotable -> hazard)."""
    from mlimgsynth_tpu.parallel.mesh import make_mesh
    q = jnp.zeros((2, 24, 4250, 64), jnp.bfloat16)
    mesh = make_mesh(tp=8)
    assert sf.eligible(q, q, q, False) and \
        not sf.eligible(q, q, q, False, mesh=mesh)


def test_attention_t_unaffected(monkeypatch):
    """attention_t (UNet transposed-v path) must not route through the
    stock kernel even under force."""
    monkeypatch.setenv("MLIS_FLASH_STOCK", "force")
    monkeypatch.setenv("MLIS_FLASH_ATTENTION", "1")
    called = []
    monkeypatch.setattr(sf, "stock_flash",
                        lambda *a, **kw: called.append(1))
    q = rand(1, 2, 256, 64, seed=1) * 0.5
    k = rand(1, 2, 256, 64, seed=2) * 0.5
    vt = rand(1, 2, 64, 256, seed=3)
    att.attention_t(q, k, vt)
    assert not called


def test_qpad_into_unpromotable_regime(monkeypatch):
    """When the natural output sits in the promotion window but a bounded
    zero-pad of q crosses the 16 MiB stack, the wrapper pads and slices —
    numerics must match the unpadded reference exactly on the real rows.
    The stack is monkeypatched small so tiny interpret shapes exercise
    the path."""
    monkeypatch.setattr(sf, "_PROMOTION_STACK", 40_000)
    b, h, s, d = 1, 2, 300, 64
    # per_row = 256 B -> natural 76.8 kB > 40 kB... pick the window:
    monkeypatch.setattr(sf, "_PROMOTION_STACK", 90_000)
    # natural 300*256 = 76.8 kB < 90 kB; need 352 rows (ratio 1.17 <= 1.35)
    assert sf._padded_sq(b, h, s, d, 2) == 384
    q = rand(b, h, s, d, seed=1) * 0.5
    k = rand(b, h, s, d, seed=2) * 0.5
    v = rand(b, h, s, d, seed=3)
    out = sf.stock_flash(q, k, v)
    assert out.shape == (b, h, s, d)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_unet_gate_eligibility(monkeypatch):
    """MLIS_FLASH_UNET_STOCK=auto extends eligibility into the
    promotion-window UNet regime under regime-(a) accounting (kernel
    frame + full output <= budget); default stays off."""
    sdxl = jnp.zeros((2, 10, 4096, 64), jnp.bfloat16)   # 10 MiB out
    sd15 = jnp.zeros((2, 8, 4096, 40), jnp.bfloat16)    # 5 MiB out
    sd21 = jnp.zeros((2, 10, 2304, 64), jnp.bfloat16)   # 5.9 MiB, padded kv
    # default: off -> unchanged behavior
    for q in (sdxl, sd15, sd21):
        assert not sf.eligible(q, q, q, False)
    monkeypatch.setenv("MLIS_FLASH_UNET_STOCK", "auto")
    for q in (sdxl, sd15, sd21):
        assert sf.eligible(q, q, q, False)
    # large-S shapes keep their own gate (sd3 joint: still eligible)
    big = jnp.zeros((2, 24, 4250, 64), jnp.bfloat16)
    assert sf.eligible(big, big, big, False)
    # cross attention and tiny S stay out
    k77 = jnp.zeros((2, 10, 77, 64), jnp.bfloat16)
    assert not sf.eligible(sdxl, k77, k77, False)
    tiny = jnp.zeros((2, 10, 256, 64), jnp.bfloat16)
    assert not sf.eligible(tiny, tiny, tiny, False)
    # no block choice fits the budget -> ineligible (frame forced huge)
    monkeypatch.setattr(sf, "_VMEM_BUDGET", 1)
    assert not sf.eligible(sdxl, sdxl, sdxl, False)


def test_attn_mhead_unet_stock_routes_and_matches(monkeypatch):
    """Under MLIS_FLASH_UNET_STOCK=force, attn_mhead must emit the
    NATURAL layout (no transposed-v projections) and attention() must
    route to the stock wrapper — with numerics matching the shipped
    transposed path."""
    import jax
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.ops import flash_attention as fa

    if jax.default_backend() != "tpu":
        orig = fa.pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            kw.pop("compiler_params", None)
            return orig(*a, **kw)

        monkeypatch.setattr(fa.pl, "pallas_call", interp)

    d_model, n_head, s = 64, 2, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, s, d_model)).astype(np.float32)
                    * 0.3)
    spec = B.trace_spec(
        lambda ctx, x: B.attn_mhead(ctx, "blk.attn1", x, x, x,
                                    d_model, d_model, n_head), x)
    params = {k: jnp.asarray(
        rng.standard_normal(ps.shape).astype(np.float32) * 0.05)
        for k, ps in spec.items()}

    monkeypatch.setenv("MLIS_FLASH_ATTENTION", "1")
    base = B.attn_mhead(B.Ctx(params), "blk.attn1", x, x, x,
                        d_model, d_model, n_head)

    calls = []
    orig_sf = sf.stock_flash
    monkeypatch.setattr(sf, "stock_flash",
                        lambda *a, **kw: calls.append(1) or orig_sf(*a, **kw))
    monkeypatch.setenv("MLIS_FLASH_UNET_STOCK", "force")
    monkeypatch.setenv("MLIS_FLASH_STOCK", "force")
    out = B.attn_mhead(B.Ctx(params), "blk.attn1", x, x, x,
                       d_model, d_model, n_head)
    assert calls, "stock wrapper was not reached"
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2e-3, rtol=2e-3)


def test_unet_stock_preferred_rejects_f32(monkeypatch):
    """auto mode: an f32 session must keep the transposed-v path — the
    dispatcher refuses f32 stock routing (S(1) placement, round-3), so
    preferring natural layout there would strand the shape on the XLA
    fallback.  force (tests) skips the gate like every other gate."""
    from mlimgsynth_tpu.ops.attention import unet_stock_preferred
    monkeypatch.setenv("MLIS_FLASH_UNET_STOCK", "auto")
    args = (2, 10, 4096, 4096, 64)   # sdxl self-attention, in-window
    assert unet_stock_preferred(*args, dtype=jnp.bfloat16)
    assert not unet_stock_preferred(*args, dtype=jnp.float32)
    monkeypatch.setenv("MLIS_FLASH_UNET_STOCK", "force")
    assert unet_stock_preferred(*args, dtype=jnp.float32)
