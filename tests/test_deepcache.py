"""DeepCache-style UNet encoder caching (PAPERS.md "Faster Diffusion"):
opt-in approximation — deep levels + mid transformer reused between
refresh steps, carried in the scan state, lax.cond per step."""
import numpy as np
import pytest
import jax.numpy as jnp

from mlimgsynth_tpu.api import MLImgSynth, MlisError
from helpers import (TINY_MODEL_TYPE, patch_tiny_model_types,
                     write_tiny_checkpoint)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_dc.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def make(ckpt, method="euler"):
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 4)
    s.option_set("seed", 13)
    s.option_set("method", method)
    s.option_set("no-decode", 1)
    return s


def test_unet_cache_split_exact(ckpt, monkeypatch):
    """The shallow path fed a same-x cache reproduces the full forward
    bit-exactly (the split is a pure refactoring of the dataflow)."""
    import jax
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import unet as U
    from mlimgsynth_tpu.testing import TINY_UNET
    P = TINY_UNET
    spec = B.trace_spec(
        lambda ctx, x, t, c: U.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)),
        jnp.zeros((2, 77, P.n_ctx)))
    r = np.random.RandomState(0)
    params = {k: (r.randn(*ps.shape) * 0.05).astype(np.float32)
              for k, ps in spec.items()}
    ctx = B.Ctx(params, dtype=jnp.float32)
    x = jnp.asarray(r.randn(2, 8, 8, 4), jnp.float32)
    t = jnp.asarray([3.0, 3.0])
    c = jnp.asarray(r.randn(2, 77, P.n_ctx), jnp.float32)
    full = np.asarray(U.unet_apply(ctx, x, t, c, None, P))
    out, cache = U.unet_apply(ctx, x, t, c, None, P, want_cache=True)
    np.testing.assert_array_equal(full, np.asarray(out))
    shallow = U.unet_apply(ctx, x, t, c, None, P, use_cache=cache)
    np.testing.assert_array_equal(full, np.asarray(shallow))


@pytest.mark.parametrize("method", ["euler", "dpmpp2m"])
def test_deepcache_interval_one_is_exact(ckpt, monkeypatch, method):
    """interval 1 refreshes every step: identical to the baseline run
    (the lax.cond full branch is numerically the plain forward).
    Note deepcache=1 is treated as off; compare off vs interval where
    every step is a refresh via a 2-step run at interval 2."""
    patch_tiny_model_types(monkeypatch)
    s = make(ckpt, method)
    s.option_set("prompt", "a test")
    base = np.asarray(s.generate())

    s2 = make(ckpt, method)
    s2.option_set("deepcache", 2)
    s2.option_set("prompt", "a test")
    out = np.asarray(s2.generate())
    # steps 0 and 2 are refreshes; 1 and 3 ride the cache -> approximate
    assert out.shape == base.shape and np.isfinite(out).all()
    assert not np.array_equal(out, base)
    # deterministic
    s2.option_set("seed", 13)
    s2.option_set("prompt", "a test")
    np.testing.assert_array_equal(out, np.asarray(s2.generate()))


def test_deepcache_chunked_matches_fused(ckpt, monkeypatch):
    """The cancellable (chunked) path carries the cache across chunk
    boundaries: bit-identical to the single-dispatch run."""
    patch_tiny_model_types(monkeypatch)
    s = make(ckpt)
    s.option_set("deepcache", 2)
    s.option_set("prompt", "chunked dc")
    fused = np.asarray(s.generate())
    s2 = make(ckpt)
    s2.option_set("deepcache", 2)
    s2.option_set("callback", lambda *a: 0)
    s2.option_set("prompt", "chunked dc")
    np.testing.assert_array_equal(fused, np.asarray(s2.generate()))


def test_deepcache_gates(ckpt, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    s = make(ckpt, method="heun")      # 2 evals/step: rejected
    s.option_set("deepcache", 3)
    s.option_set("prompt", "x")
    with pytest.raises(MlisError):
        s.generate()


def test_deepcache_sdxl_labels(tmp_path, monkeypatch):
    """SDXL: size labels + dual-encoder cond flow through both cond
    branches; 3-level UNet shallow pass has no level-0 attention."""
    from helpers import TINY_MODEL_TYPE_XL, write_checkpoint_sdxl
    patch_tiny_model_types(monkeypatch, {"sdxl": TINY_MODEL_TYPE_XL})
    path = tmp_path / "xl.safetensors"
    write_checkpoint_sdxl(path)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(path))
    s.option_set("model-type", "sdxl")
    s.option_set("image-dim", 64)
    s.option_set("steps", 4)
    s.option_set("seed", 7)
    s.option_set("deepcache", 2)
    s.option_set("prompt", "an xl test")
    img = s.generate()
    assert np.isfinite(img).all()
    # reproduces exactly
    s.option_set("seed", 7)
    s.option_set("prompt", "an xl test")
    np.testing.assert_array_equal(img, s.generate())


# ---- flow-model (MMDiT) deepcache: deep-tail residual reuse ----

def test_mmdit_cache_split_exact():
    """MMDiT deep-tail residual cache: the shallow run + a same-x cache
    reconstructs the full forward to f.p. rounding (models/mmdit.py
    _dc_split; the residual form x_k + (x_D - x_k) is ~1-ulp, not
    bit-exact like the UNet's concat cache)."""
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import mmdit as M
    from mlimgsynth_tpu.testing import TINY_MMDIT
    P = TINY_MMDIT
    spec = B.trace_spec(
        lambda ctx, x, t, c, y: M.mmdit_apply(ctx, x, t, c, y, P),
        jnp.zeros((2, 8, 8, P.n_ch_in)), jnp.zeros((2,)),
        jnp.zeros((2, 5, P.d_ctx_in)), jnp.zeros((2, P.d_pooled)))
    r = np.random.RandomState(0)
    params = {k: (r.randn(*ps.shape) * 0.05).astype(np.float32)
              for k, ps in spec.items()}
    ctx = B.Ctx(params, dtype=jnp.float32)
    x = jnp.asarray(r.randn(2, 8, 8, P.n_ch_in), jnp.float32)
    t = jnp.asarray([500.0, 500.0])
    c = jnp.asarray(r.randn(2, 5, P.d_ctx_in) * 0.3, jnp.float32)
    y = jnp.asarray(r.randn(2, P.d_pooled) * 0.3, jnp.float32)
    full = np.asarray(M.mmdit_apply(ctx, x, t, c, y, P))
    out, cache = M.mmdit_apply(ctx, x, t, c, y, P, want_cache=True)
    np.testing.assert_array_equal(full, np.asarray(out))
    shallow = np.asarray(M.mmdit_apply(ctx, x, t, c, y, P,
                                       use_cache=cache))
    np.testing.assert_allclose(full, shallow, rtol=2e-6,
                               atol=2e-6 * np.abs(full).max())


@pytest.fixture(scope="module")
def sd3_ckpt(tmp_path_factory):
    from mlimgsynth_tpu.testing import write_checkpoint_sd3
    path = tmp_path_factory.mktemp("models") / "tiny_dc_sd3.safetensors"
    write_checkpoint_sd3(path)
    return str(path)


def make_sd3(sd3_ckpt, monkeypatch, method="euler"):
    from mlimgsynth_tpu.testing import TINY_MODEL_TYPE_SD3
    patch_tiny_model_types(monkeypatch, {"sd3": TINY_MODEL_TYPE_SD3})
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", sd3_ckpt)
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 4)
    s.option_set("seed", 13)
    s.option_set("method", method)
    s.option_set("no-decode", 1)
    return s


@pytest.mark.parametrize("method", ["euler", "dpmpp2m"])
def test_deepcache_sd3_e2e(sd3_ckpt, monkeypatch, method):
    """Flow deepcache on the tiny SD3: runs, finite, deterministic, and
    an approximation of (not identical to) the uncached trajectory."""
    s = make_sd3(sd3_ckpt, monkeypatch, method)
    s.option_set("prompt", "a flow test")
    base = np.asarray(s.generate())

    s2 = make_sd3(sd3_ckpt, monkeypatch, method)
    s2.option_set("deepcache", 2)
    s2.option_set("prompt", "a flow test")
    out = np.asarray(s2.generate())
    assert out.shape == base.shape and np.isfinite(out).all()
    assert not np.array_equal(out, base)
    s2.option_set("seed", 13)
    s2.option_set("prompt", "a flow test")
    np.testing.assert_array_equal(out, np.asarray(s2.generate()))


def test_deepcache_sd3_chunked_matches_fused(sd3_ckpt, monkeypatch):
    """The chunked (cancellable) path carries the MMDiT cache across
    chunk boundaries bit-identically to the fused scan."""
    s = make_sd3(sd3_ckpt, monkeypatch)
    s.option_set("deepcache", 2)
    s.option_set("prompt", "chunked flow dc")
    fused = np.asarray(s.generate())
    s2 = make_sd3(sd3_ckpt, monkeypatch)
    s2.option_set("deepcache", 2)
    s2.option_set("callback", lambda *a: 0)
    s2.option_set("prompt", "chunked flow dc")
    np.testing.assert_array_equal(fused, np.asarray(s2.generate()))


def test_deepcache_sd3_slg_rejected(sd3_ckpt, monkeypatch):
    """slg's extra skip-layer eval cannot ride the cached body."""
    s = make_sd3(sd3_ckpt, monkeypatch)
    s.option_set("deepcache", 2)
    s.option_set("slg-scale", 2.0)
    s.option_set("slg-layers", "1")
    s.option_set("prompt", "x")
    with pytest.raises(MlisError) as ei:
        s.generate()
    assert "deepcache" in str(ei.value)


def test_flux_cache_split_exact():
    """Flux deep-tail residual cache on the concatenated txt++img
    stream: the shallow run + a same-x cache reconstructs the full
    forward to f.p. rounding."""
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import flux as F
    from mlimgsynth_tpu.testing import TINY_FLUX_SCHNELL
    P = TINY_FLUX_SCHNELL
    spec = B.trace_spec(
        lambda ctx, x, t, c, y: F.flux_apply(ctx, x, t, c, y, P),
        jnp.zeros((2, 8, 8, P.n_ch_in // 4)), jnp.zeros((2,)),
        jnp.zeros((2, 6, P.d_ctx_in)), jnp.zeros((2, P.d_pooled)))
    r = np.random.RandomState(0)
    params = {k: (r.randn(*ps.shape) * 0.05).astype(np.float32)
              for k, ps in spec.items()}
    ctx = B.Ctx(params, dtype=jnp.float32)
    x = jnp.asarray(r.randn(2, 8, 8, P.n_ch_in // 4), jnp.float32)
    t = jnp.asarray([500.0, 500.0])
    c = jnp.asarray(r.randn(2, 6, P.d_ctx_in) * 0.3, jnp.float32)
    y = jnp.asarray(r.randn(2, P.d_pooled) * 0.3, jnp.float32)
    full = np.asarray(F.flux_apply(ctx, x, t, c, y, P))
    out, cache = F.flux_apply(ctx, x, t, c, y, P, want_cache=True)
    np.testing.assert_array_equal(full, np.asarray(out))
    shallow = np.asarray(F.flux_apply(ctx, x, t, c, y, P,
                                      use_cache=cache))
    np.testing.assert_allclose(full, shallow, rtol=2e-6,
                               atol=2e-6 * np.abs(full).max())


@pytest.mark.parametrize("model_key", ["flux_schnell", "flux_dev"])
def test_deepcache_flux_e2e(tmp_path, monkeypatch, model_key):
    """Flux deepcache (schnell plain + dev embedded-guidance): runs,
    finite, deterministic, approximates the uncached trajectory."""
    from mlimgsynth_tpu.testing import (TINY_CLIP, TINY_FLUX_DEV,
                                        TINY_FLUX_SCHNELL, TINY_VAE_FLUX,
                                        write_tiny_flux_files)
    from mlimgsynth_tpu.api import ModelTypeDef
    P = TINY_FLUX_DEV if model_key == "flux_dev" else TINY_FLUX_SCHNELL
    patch_tiny_model_types(monkeypatch, {
        model_key: ModelTypeDef(model_key, TINY_CLIP, None, P,
                                TINY_VAE_FLUX, 64, 1)})
    files = write_tiny_flux_files(tmp_path, P=P)

    def make(dc):
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", files["model"])
        s.option_set("clip", files["clip"])
        s.option_set("vae", files["vae"])
        s.option_set("image-dim", 64, 64)
        s.option_set("steps", 4)
        s.option_set("seed", 31)
        s.option_set("no-decode", 1)
        s.option_set("prompt", "a flux dc test")
        if dc:
            s.option_set("deepcache", dc)
        return s

    base = np.asarray(make(0).generate())
    out = np.asarray(make(2).generate())
    assert out.shape == base.shape and np.isfinite(out).all()
    assert not np.array_equal(out, base)
    np.testing.assert_array_equal(out, np.asarray(make(2).generate()))


@pytest.mark.parametrize("method", ["dpmpp2m_sde", "taylor3", "unipc"])
def test_deepcache_one_eval_solvers(ckpt, monkeypatch, method):
    """Every 1-eval solver composes with the cache (the closure-cell
    update fires once per step; unipc's corrector and the SDE re-noise
    ride outside the single dxdt call).  heun/dpmpp2s stay rejected
    (test_deepcache_gates)."""
    patch_tiny_model_types(monkeypatch)
    s = make(ckpt, method)
    s.option_set("deepcache", 2)
    s.option_set("prompt", "solver dc")
    out = np.asarray(s.generate())
    assert np.isfinite(out).all()
    s.option_set("seed", 13)
    s.option_set("prompt", "solver dc")
    np.testing.assert_array_equal(out, np.asarray(s.generate()))
