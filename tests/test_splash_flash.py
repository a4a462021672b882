"""Splash-kernel dispatch path (ops/splash_flash) vs the XLA reference.

Splash attention is a data-driven adoption candidate for the DiT
large-S regime (queue-35 A/B); these tests pin the wrapper numerics
(block padding + rectangular kv mask, promotion-window q padding), the
eligibility gates (default OFF), and that attention() dispatches there
under force mode ahead of the stock kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.ops import splash_flash as spl
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


@pytest.mark.parametrize("s,d,blk", [
    (256, 64, "256,256"),    # dividing: FullMask path
    (300, 64, "256,256"),    # padded kv: rectangular NumpyMask
    (640, 128, "256,256"),   # d=128, ragged 640 -> 768
])
def test_splash_wrapper_matches_xla(s, d, blk, monkeypatch):
    monkeypatch.setenv("MLIS_SPLASH_BLOCK", blk)
    q = rand(1, 2, s, d, seed=1) * 0.5
    k = rand(1, 2, s, d, seed=2) * 0.5
    v = rand(1, 2, s, d, seed=3)
    out = spl.splash_flash(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16))
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_attention_dispatches_splash_before_stock(monkeypatch):
    monkeypatch.setenv("MLIS_FLASH_SPLASH", "force")
    monkeypatch.setenv("MLIS_FLASH_STOCK", "force")
    monkeypatch.setenv("MLIS_FLASH_ATTENTION", "1")
    monkeypatch.setenv("MLIS_SPLASH_BLOCK", "256,256")
    splash_calls, stock_calls = [], []
    orig = spl.splash_flash
    monkeypatch.setattr(spl, "splash_flash",
                        lambda *a, **kw: splash_calls.append(1) or
                        orig(*a, **kw))
    monkeypatch.setattr(sf, "stock_flash",
                        lambda *a, **kw: stock_calls.append(1))
    q = rand(1, 2, 256, 64, seed=1).astype(jnp.bfloat16) * 0.5
    k = rand(1, 2, 256, 64, seed=2).astype(jnp.bfloat16) * 0.5
    v = rand(1, 2, 256, 64, seed=3).astype(jnp.bfloat16)
    out = attention(q, k, v)
    assert splash_calls and not stock_calls
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_eligibility_gates(monkeypatch):
    big = (jnp.zeros((2, 24, 4250, 64), jnp.bfloat16),) * 3
    # default OFF until the hardware A/B lands
    assert not spl.eligible(*big, False)
    monkeypatch.setenv("MLIS_FLASH_SPLASH", "auto")
    assert spl.eligible(*big, False)
    assert not spl.eligible(*big, True)              # causal unsupported
    # cross attention (sq != sk)
    k77 = jnp.zeros((2, 24, 77, 64), jnp.bfloat16)
    assert not spl.eligible(big[0], k77, k77, False)
    # small-S regime stays on our kernel
    small = (jnp.zeros((2, 8, 1024, 64), jnp.bfloat16),) * 3
    assert not spl.eligible(*small, False)
    # f32 never auto-eligible (S(1)-placement above 16 MiB, r3 finding)
    f32 = (jnp.zeros((2, 24, 4250, 64), jnp.float32),) * 3
    assert not spl.eligible(*f32, False)
    # d neither 64 nor a lane multiple
    d160 = (jnp.zeros((2, 24, 4250, 160), jnp.bfloat16),) * 3
    assert not spl.eligible(*d160, False)
    # promotion-window shape with too-costly q pad: same bound as stock
    sdxl = (jnp.zeros((2, 10, 4096, 64), jnp.bfloat16),) * 3
    assert not spl.eligible(*sdxl, False)


def test_qpad_into_unpromotable_regime(monkeypatch):
    """Promotion-window shapes pad q into the unpromotable regime and
    slice the result (stack monkeypatched small for interpret shapes)."""
    monkeypatch.setenv("MLIS_SPLASH_BLOCK", "128,128")
    monkeypatch.setattr(sf, "_PROMOTION_STACK", 90_000)
    b, h, s, d = 1, 2, 300, 64
    q = rand(b, h, s, d, seed=1).astype(jnp.bfloat16) * 0.5
    k = rand(b, h, s, d, seed=2).astype(jnp.bfloat16) * 0.5
    v = rand(b, h, s, d, seed=3).astype(jnp.bfloat16)
    out = spl.splash_flash(q, k, v)
    assert out.shape == (b, h, s, d)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_mesh_shard_map_splash(monkeypatch):
    """Under an active mesh + force mode, attention() runs the splash
    wrapper inside the shard_map over (dp, tp) and matches the unsharded
    XLA reference (per-device heads block, interpret kernel off-TPU)."""
    import mlimgsynth_tpu.parallel.mesh as pmesh
    from mlimgsynth_tpu.ops import attention as am

    monkeypatch.setenv("MLIS_FLASH_SPLASH", "force")
    monkeypatch.setenv("MLIS_FLASH_ATTENTION", "1")
    monkeypatch.setenv("MLIS_SPLASH_BLOCK", "128,128")
    mesh = pmesh.make_mesh(8, tp=4)
    monkeypatch.setattr(am, "MESH", mesh)
    calls = []
    orig = spl.splash_flash
    monkeypatch.setattr(spl, "splash_flash",
                        lambda *a, **kw: calls.append(1) or orig(*a, **kw))
    q = rand(2, 8, 256, 64, seed=1).astype(jnp.bfloat16) * 0.5
    k = rand(2, 8, 256, 64, seed=2).astype(jnp.bfloat16) * 0.5
    v = rand(2, 8, 256, 64, seed=3).astype(jnp.bfloat16)
    out = attention(q, k, v)
    assert calls, "splash path not taken under the mesh"
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)
