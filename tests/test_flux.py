"""Flux.1 forward parity vs an independent torch transcription.

Same harness as test_mmdit.py; the torch side builds RoPE as rotation
matrices applied to adjacent pairs (the flux reference form) while the JAX
side uses split-interleave cos/sin tables — agreement checks both."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import flux as flux_mod
from mlimgsynth_tpu.testing import _random_for_spec
from mlimgsynth_tpu.weights import _to_layout

from torch_ref import torch_flux

TINY_FLUX = flux_mod.FluxParams(
    depth_double=2, depth_single=2, d_model=32, n_head=2,
    axes_dim=(4, 6, 6), n_ch_in=16, n_ch_out=16, d_ctx_in=48, d_pooled=24,
    n_ctx=48, ch_adm_in=24)


def _make_params(spec, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, scale)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return ckpt, model


def _spec(P, hw=8, n=2, s_txt=5):
    return B.trace_spec(
        lambda ctx, x, t, c, y: flux_mod.flux_apply(
            ctx, x, t, c, y, P,
            guidance=(jnp.zeros((n,)) if P.guidance_embed else None)),
        jnp.zeros((n, hw, hw, P.n_ch_in // 4)), jnp.zeros((n,)),
        jnp.zeros((n, s_txt, P.d_ctx_in)), jnp.zeros((n, P.d_pooled)))


@pytest.mark.parametrize("guidance_embed", [False, True])
def test_flux_matches_torch(guidance_embed):
    P = dataclasses.replace(TINY_FLUX, guidance_embed=guidance_embed)
    spec = _spec(P)
    if guidance_embed:
        assert "flux.guidance_in.in_layer.weight" in spec
    ckpt, model = _make_params(spec)
    rng = np.random.default_rng(1)
    cl = P.n_ch_in // 4
    x = rng.standard_normal((2, cl, 8, 8)).astype(np.float32)
    t = np.array([1000.0, 250.0], np.float32)
    cond = rng.standard_normal((2, 5, P.d_ctx_in)).astype(np.float32) * 0.3
    pooled = rng.standard_normal((2, P.d_pooled)).astype(np.float32) * 0.3
    guidance = np.array([3.5, 1.0], np.float32) if guidance_embed else None

    ctx = B.Ctx(model, dtype=jnp.float32)
    got = np.asarray(flux_mod.flux_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), jnp.asarray(pooled), P,
        guidance=(jnp.asarray(guidance) if guidance_embed else None)),
        np.float32).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = torch_flux(
            ckpt, torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(cond), torch.from_numpy(pooled), P,
            guidance=(torch.from_numpy(guidance) if guidance_embed
                      else None)).numpy()
    # atol: measured f32 accumulation spread ~4e-4 at |ref|~1.4 (the rope
    # rotations + parallel-attn reductions reassociate between stacks)
    np.testing.assert_allclose(got, ref, atol=1e-3,
                               err_msg="Flux forward mismatch vs torch")


def test_flux_rope_positions_matter():
    """Permuting image positions changes outputs through RoPE only (all
    other position dependence is absent in the tiny model)."""
    P = TINY_FLUX
    spec = _spec(P)
    _, model = _make_params(spec, seed=2)
    ctx = B.Ctx(model, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, P.n_ch_in // 4)).astype(np.float32)
    cond = rng.standard_normal((1, 5, P.d_ctx_in)).astype(np.float32) * 0.3
    pooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.3
    t = jnp.full((1,), 500.0)
    a = np.asarray(flux_mod.flux_apply(ctx, jnp.asarray(x), t,
                                       jnp.asarray(cond),
                                       jnp.asarray(pooled), P))
    xs = np.roll(x, 2, axis=2)   # shift content; rope anchors to position
    b = np.asarray(flux_mod.flux_apply(ctx, jnp.asarray(xs), t,
                                       jnp.asarray(cond),
                                       jnp.asarray(pooled), P))
    b_back = np.roll(b, -2, axis=2)
    assert np.abs(a - b_back).max() > 1e-4


def test_flux_dynamic_shift():
    P = flux_mod.FLUX_DEV
    # schnell: constant
    assert flux_mod.dynamic_flow_shift(flux_mod.FLUX_SCHNELL, 128, 128) \
        == 1.0
    # dev endpoints: 256 patches -> exp(0.5), 4096 patches -> exp(1.15)
    import math
    np.testing.assert_allclose(
        flux_mod.dynamic_flow_shift(P, 32, 32), math.exp(0.5), rtol=1e-6)
    np.testing.assert_allclose(
        flux_mod.dynamic_flow_shift(P, 128, 128), math.exp(1.15), rtol=1e-6)


def test_flux_denoise_guidance_column():
    """denoise() splits the guidance column off the label tensor."""
    P = dataclasses.replace(TINY_FLUX, guidance_embed=True)
    spec = _spec(P)
    _, model = _make_params(spec, seed=4)
    ctx = B.Ctx(model, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, P.n_ch_in // 4)),
                    jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 5, P.d_ctx_in)), jnp.float32)
    pooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32)
    lab = jnp.asarray(np.concatenate(
        [pooled, np.full((1, 1), 4.0, np.float32)], axis=-1))
    sigma = 0.6
    d = flux_mod.denoise(ctx, x, sigma, sigma * 1000.0, cond, lab, P)
    raw = flux_mod.flux_apply(ctx, x, jnp.full((1,), sigma * 1000.0), cond,
                              jnp.asarray(pooled), P,
                              guidance=jnp.full((1,), 4.0))
    np.testing.assert_allclose(np.asarray(d), np.asarray(raw, np.float32),
                               atol=1e-6)


def test_flux_slg_skip_layers_and_trajectory():
    """skip_layers elides double blocks (indices < depth_double) and single
    blocks (offset indices); the SLG sampler trajectory matches a manual
    loop on a tiny schnell-style (cfg=1) run."""
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)
    P = TINY_FLUX
    spec = _spec(P, n=1)
    _, model = _make_params(spec, seed=6)
    ctx = B.Ctx(model, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(
        (1, 8, 8, P.n_ch_in // 4)).astype(np.float32))
    t = jnp.full((1,), 500.0)
    cond = rng.standard_normal((1, 5, P.d_ctx_in)).astype(np.float32) * 0.3
    pooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.3
    full = np.asarray(flux_mod.flux_apply(
        ctx, x, t, jnp.asarray(cond), jnp.asarray(pooled), P))
    # each block index changes the forward; double and single offsets hit
    # distinct blocks
    outs = [np.asarray(flux_mod.flux_apply(
        ctx, x, t, jnp.asarray(cond), jnp.asarray(pooled), P,
        skip_layers=(i,))) for i in range(4)]
    for i, o in enumerate(outs):
        assert np.abs(o - full).max() > 1e-7, f"skip {i} was a no-op"

    # sampler-level: schnell-style cfg<=1 run with slg over all steps
    cfg = SamplerConfig(method="euler", n_step=3, cfg_scale=1.0,
                        flow_shift=1.0, slg_scale=2.0, slg_layers=(2,),
                        slg_start=0.0, slg_end=1.0)
    x0 = rng.standard_normal((1, P.n_ch_in // 4, 8, 8)).astype(np.float32)
    plan = make_plan(cfg, x0.shape, RngPhilox(seed=9))
    got = run_sampler(model, x0, plan, cond, None, pooled, None, None,
                      cfg, P, dtype=jnp.float32)

    def vel(x_nchw, sigma):
        tt = jnp.full((1,), sigma * P.n_step_train, jnp.float32)
        xh = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        vc = np.asarray(flux_mod.flux_apply(
            ctx, xh, tt, jnp.asarray(cond), jnp.asarray(pooled), P),
            np.float32)
        vs = np.asarray(flux_mod.flux_apply(
            ctx, xh, tt, jnp.asarray(cond), jnp.asarray(pooled), P,
            skip_layers=(2,)), np.float32)
        return (vc + cfg.slg_scale * (vc - vs)).transpose(0, 3, 1, 2)

    sig = plan.sigmas
    xm = x0 * (1.0 - sig[0]) + plan.noise0 * sig[0]
    for i in range(plan.n_step):
        xm = xm + vel(xm, float(sig[i])) \
            * (float(sig[i + 1]) - float(sig[i]))
    np.testing.assert_allclose(np.asarray(got), xm, atol=2e-4,
                               err_msg="flux slg trajectory mismatch")
