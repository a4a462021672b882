"""Perturbed-attention guidance (Ahn et al. 2024, "Self-Rectifying
Diffusion Sampling with Perturbed-Attention Guidance"): an extra
conditional UNet eval with the MID transformer's self-attention map
replaced by the identity, mixed as out += pag_scale * (cond - perturbed).
Beyond the reference.  Properties tested: the identity-attention map
equals full attention on a single token (softmax over one key == 1), the
sampler trajectory matches a hand-rolled host loop, the step window
gates, and the MMDiT families reject the option cleanly."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import patch_tiny_model_types, write_tiny_checkpoint
from mlimgsynth_tpu.api import MLImgSynth, MlisError
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.rng import RngPhilox
from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                             run_sampler)
from mlimgsynth_tpu.testing import TINY_UNET


def _random_params(spec, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return {name: jnp.asarray(
        rng.standard_normal(ps.shape).astype(np.float32) * scale,
        dtype=ps.dtype) for name, ps in spec.items()}


def _unet_params(P, seed=0):
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, P.n_ctx)))
    return _random_params(spec, seed)


def test_identity_attention_single_token_equivalence():
    """With one token, softmax over the single key is 1, so full attention
    IS the identity map: attn_mhead(identity=True) must match exactly."""
    rng = np.random.default_rng(0)
    d = 32
    spec = B.trace_spec(
        lambda ctx, x: B.attn_mhead(ctx, "a", x, x, x, d, d, 4),
        jnp.zeros((2, 1, d)))
    params = _random_params(spec, 1)
    ctx = B.Ctx(params, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 1, d)).astype(np.float32))
    full = B.attn_mhead(ctx, "a", x, x, x, d, d, 4)
    ident = B.attn_mhead(ctx, "a", x, x, x, d, d, 4, identity=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ident),
                               atol=1e-5)


def test_pag_forward_differs_multi_token():
    """On multi-token inputs the perturbed forward differs from the full
    one (the perturbation is real)."""
    P = TINY_UNET
    params = _unet_params(P)
    ctx = B.Ctx(params, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray([500.0])
    c = jnp.asarray(rng.standard_normal((1, 7, P.n_ctx)).astype(np.float32)
                    * 0.2)
    a = np.asarray(unet_mod.unet_apply(ctx, x, t, c, None, P))
    b = np.asarray(unet_mod.unet_apply(ctx, x, t, c, None, P, pag=True))
    assert np.abs(a - b).max() > 1e-6


def test_pag_trajectory_matches_manual():
    """run_sampler with pag == a hand-rolled euler loop with the extra
    perturbed eval mixed in, window-gated."""
    P = TINY_UNET
    params = _unet_params(P)
    rng = np.random.default_rng(3)
    cond = rng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.2
    ncond = rng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.2
    x0 = np.zeros((1, 4, 8, 8), np.float32)

    cfg = SamplerConfig(method="euler", n_step=4, cfg_scale=7.0,
                        pag_scale=3.0, pag_start=0.0, pag_end=0.5)
    plan = make_plan(cfg, x0.shape, RngPhilox(seed=42), nfe_per_dxdt=2)
    got = run_sampler(params, x0, plan, cond, ncond, None, None, None,
                      cfg, P, dtype=jnp.float32)

    ctx = B.Ctx(params, dtype=jnp.float32)
    i0 = int(round(cfg.pag_start * plan.n_step))
    i1 = max(int(round(cfg.pag_end * plan.n_step)), i0 + 1)
    from mlimgsynth_tpu.sampling.schedule import get_log_sigmas
    from mlimgsynth_tpu.sampling.sampler import jnp_sigma_to_t

    def dxdt(x_nchw, sigma, pag_on):
        t = jnp_sigma_to_t(jnp.asarray(get_log_sigmas()),
                           jnp.float32(sigma))
        xh = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        dc = np.asarray(unet_mod.denoise(
            ctx, xh, sigma, t, jnp.asarray(cond), None, P), np.float32)
        du = np.asarray(unet_mod.denoise(
            ctx, xh, sigma, t, jnp.asarray(ncond), None, P), np.float32)
        d = cfg.cfg_scale * dc + (1.0 - cfg.cfg_scale) * du
        if pag_on:
            dp = np.asarray(unet_mod.denoise(
                ctx, xh, sigma, t, jnp.asarray(cond), None, P, pag=True),
                np.float32)
            d = d + cfg.pag_scale * (dc - dp)
        return d.transpose(0, 3, 1, 2)

    sig = plan.sigmas
    x = x0 + plan.noise0 * sig[0]
    for i in range(plan.n_step):
        x = x + dxdt(x, float(sig[i]), i0 <= i < i1) \
            * (float(sig[i + 1]) - float(sig[i]))
    np.testing.assert_allclose(np.asarray(got), x, atol=2e-4,
                               err_msg="pag trajectory mismatch")

    # window gating is real: full-window pag differs
    cfg_all = SamplerConfig(method="euler", n_step=4, cfg_scale=7.0,
                            pag_scale=3.0, pag_start=0.0, pag_end=1.0)
    plan2 = make_plan(cfg_all, x0.shape, RngPhilox(seed=42),
                      nfe_per_dxdt=2)
    got_all = run_sampler(params, x0, plan2, cond, ncond, None, None,
                          None, cfg_all, P, dtype=jnp.float32)
    assert np.abs(np.asarray(got_all) - np.asarray(got)).max() > 1e-6


def test_pag_rejected_on_flow_models():
    from mlimgsynth_tpu.testing import TINY_MMDIT
    cfg = SamplerConfig(method="euler", n_step=2, cfg_scale=4.0,
                        flow_shift=3.0, pag_scale=3.0)
    plan = make_plan(cfg, (1, 4, 8, 8), RngPhilox(seed=1), nfe_per_dxdt=2)
    with pytest.raises(ValueError):
        run_sampler({}, np.zeros((1, 4, 8, 8), np.float32), plan,
                    np.zeros((1, 7, 80), np.float32),
                    np.zeros((1, 7, 80), np.float32), None, None, None,
                    cfg, TINY_MMDIT, dtype=jnp.float32)


def test_pag_session_and_infotext(tmp_path, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    path = tmp_path / "tiny.safetensors"
    write_tiny_checkpoint(path)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(path))
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 5)
    s.option_set("no-decode", True)
    s.option_set("prompt", "a cat")
    s.option_set("cfg-scale", 7.0)
    base = np.asarray(s.generate())
    s.option_set("prompt", "a cat")
    s.option_set("seed", 5)
    s.option_set("pag-scale", 3.0)
    out = np.asarray(s.generate())
    assert "PAG scale: 3" in s.infotext
    lat = np.asarray(s.tensors["latent"])
    assert np.isfinite(lat).all()
    assert np.abs(lat).max() > 0
    assert not np.array_equal(base, out)
