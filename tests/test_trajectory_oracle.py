"""End-to-end trajectory oracle: full generates vs an independent torch stack.

For every solver x schedule x noise-mode combination, a full tiny denoise
trajectory runs twice from the same Philox noise:

  * JAX stack: run_sampler (the production lax.scan body, f32) with a
    step observer collecting per-step latents;
  * torch stack: tests/torch_sampler.py, transcribed directly from the
    reference C (src/sampling.c, src/solvers.c, src/unet.c:460-498) with the
    UNet forward on pure torch kernels (tests/torch_ref.py).

Per-step latents must match — this is the only cross-implementation check of
the *composed* sampler machinery (sigma tables, schedule arithmetic, CFG
mixing, churn/ancestral noise order, solver updates), closing VERDICT r2
item 1.  Module-level forwards are covered by
test_unet_vae_parity/test_clip_parity; the Philox stream by test_rng.
"""
import numpy as np
import pytest
import torch

from helpers import TINY_UNET, TINY_UNET_V, TINY_UNET_XL
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.rng import RngPhilox
from mlimgsynth_tpu.sampling import sampler as S
from mlimgsynth_tpu.testing import _random_for_spec
from mlimgsynth_tpu.weights import _to_layout

import torch_sampler as TS

import jax.numpy as jnp


def _params_for(P, seed):
    if P.ch_adm_in:
        spec = B.trace_spec(
            lambda ctx, x, t, c, l: unet_mod.unet_apply(ctx, x, t, c, l, P),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 7, P.n_ctx)), jnp.zeros((1, P.ch_adm_in)))
    else:
        spec = B.trace_spec(
            lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 7, P.n_ctx)))
    rng = np.random.default_rng(seed)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, 0.08)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return ckpt, model


_CACHE = {}


def params_for(which):
    if which not in _CACHE:
        P = {"sd1": TINY_UNET, "sd2v": TINY_UNET_V,
             "sdxl": TINY_UNET_XL}[which]
        _CACHE[which] = (P,) + _params_for(P, seed=hash(which) % 1000)
    return _CACHE[which]


# (model, method, sched, n_step, cfg, s_ancestral, s_noise, f_t_ini, img2img,
#  mask)
CASES = [
    ("sd1",  "euler",   "uniform", 5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "heun",    "uniform", 5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "taylor3", "uniform", 5, 1.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "dpmpp2s", "karras",  5, 7.0, 1.0, 0.0, 1.0, False, False),
    ("sd1",  "euler",   "uniform", 5, 7.0, 0.0, 1.0, 1.0, False, False),
    ("sd2v", "dpmpp2m", "karras",  5, 7.0, 1.0, 0.0, 1.0, False, False),
    ("sdxl", "euler",   "uniform", 5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "euler",   "karras",  7, 7.0, 0.0, 0.0, 0.7, True,  False),
    ("sd1",  "euler",   "uniform", 4, 7.0, 1.0, 0.0, 0.8, True,  True),
    # dpmpp2m_sde (beyond-reference): oracle is the k-diffusion exp/expm1
    # algebra, production is the sigma_down/up decomposition — the match
    # proves the decomposition.  s_ancestral rides eta, s_noise the SDE
    # noise multiplier.
    ("sd1",  "dpmpp2m_sde", "karras",  5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "dpmpp2m_sde", "uniform", 5, 7.0, 0.7, 1.1, 1.0, False, False),
    ("sd2v", "dpmpp2m_sde", "karras",  5, 7.0, 1.0, 0.0, 1.0, False, False),
    ("sd1",  "dpmpp2m_sde", "uniform", 5, 7.0, 0.0, 0.0, 0.8, True,  True),
    # lcm (beyond-reference): oracle is a diffusers-LCMScheduler
    # transcription; production runs the consistency step in the scan
    # body with the re-noise on the ancestral slot.  cfg 1 is the
    # distilled-model shape; the cfg-7 case checks the CFG mixing
    # composes; the i2i case checks the strength-truncated grid.
    ("sd1",  "lcm", "lcm", 4, 1.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "lcm", "lcm", 4, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd2v", "lcm", "lcm", 4, 1.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "lcm", "lcm", 3, 1.0, 0.0, 0.0, 0.6, True,  True),
    # unipc (beyond-reference): oracle solves the corrector's R/b linear
    # system literally (float64 torch.linalg.solve, diffusers structure);
    # production folds it into precomputed 2x2-inverse scalars and the
    # dpmpp2m-form predictor.  The ancestral case exercises the
    # corrector-disabled (t_cur != t_pred) degradation; the i2i+mask case
    # the delta-form correction under mask mixing.
    ("sd1",  "unipc", "uniform", 5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "unipc", "karras",  7, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd2v", "unipc", "karras",  5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "unipc", "uniform", 5, 7.0, 1.0, 0.0, 1.0, False, False),
    ("sd1",  "unipc", "karras",  6, 7.0, 0.0, 0.0, 0.7, True,  True),
    # k-diffusion/A1111 grids (beyond-reference): oracle transcriptions
    # are independent — log-linspace, the n+1-point sgm convention, and
    # a numerically-inverted Beta(0.6,0.6) CDF vs scipy's ppf.
    ("sd1",  "euler",   "exponential", 5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "dpmpp2m", "sgm_uniform", 5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd2v", "euler",   "beta",        5, 7.0, 0.0, 0.0, 1.0, False, False),
    ("sd1",  "euler",   "exponential", 6, 7.0, 1.0, 0.0, 0.7, True, False),
    ("sd1",  "dpmpp2m", "beta",        5, 7.0, 0.0, 0.0, 1.0, False, False),
]


@pytest.mark.parametrize(
    "which,method,sched,n_step,cfg,anc,churn,fti,i2i,mask", CASES,
    ids=["-".join(map(str, c[:3])) + (f"-anc{c[5]}" if c[5] else "")
         + (f"-churn{c[6]}" if c[6] else "") + (f"-i2i{c[7]}" if c[8] else "")
         + ("-mask" if c[9] else "") for c in CASES])
def test_trajectory_matches_torch(which, method, sched, n_step, cfg, anc,
                                  churn, fti, i2i, mask):
    P, ckpt, model = params_for(which)
    drng = np.random.default_rng(99)
    cond = drng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.3
    uncond = drng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.3
    label = nlabel = None
    if P.ch_adm_in:
        label = drng.standard_normal((1, P.ch_adm_in)).astype(np.float32) * 0.3
        nlabel = drng.standard_normal(
            (1, P.ch_adm_in)).astype(np.float32) * 0.3
    x0 = (drng.standard_normal((1, 4, 8, 8)).astype(np.float32)
          if i2i else np.zeros((1, 4, 8, 8), np.float32))
    lmask = None
    if mask:
        lmask = (drng.random((1, 1, 8, 8)) > 0.5).astype(np.float32)

    # --- torch stack (independent C transcription) ---
    traj_t, sigmas_t = TS.torch_sample(
        ckpt, P, x0, torch.from_numpy(cond),
        torch.from_numpy(uncond) if cfg > 1 else None,
        torch.from_numpy(label) if label is not None else None,
        torch.from_numpy(nlabel) if nlabel is not None else None,
        rng=RngPhilox(42), n_step=n_step, method=method, sched=sched,
        cfg_scale=cfg, s_ancestral=anc, s_noise=churn, f_t_ini=fti,
        lmask=lmask[:, 0] if lmask is not None else None)

    # --- JAX stack (production scan body, f32) ---
    scfg = S.SamplerConfig(method=method, sched=sched, n_step=n_step,
                           cfg_scale=cfg, s_ancestral=anc, s_noise=churn,
                           f_t_ini=fti)
    plan = S.make_plan(scfg, x0.shape, RngPhilox(42),
                       nfe_per_dxdt=2 if cfg > 1 else 1)
    # atol covers f32 interp noise on near-zero tail sigmas (vectorized
    # t_to_sigma vs the oracle's scalar loop); beta's oracle inverts the
    # CDF numerically, so its ppf carries ~1e-6 quadrature error
    np.testing.assert_allclose(plan.sigmas, sigmas_t, rtol=2e-6,
                               atol=(5e-5 if sched == "beta" else 2e-6),
                               err_msg="sigma schedule mismatch")
    got = []
    S.run_sampler(model, x0, plan, cond, uncond if cfg > 1 else None,
                  label, nlabel, lmask, scfg, P, dtype=jnp.float32,
                  step_observer=lambda i, lat: got.append(lat.copy()))

    assert len(got) == len(traj_t) == plan.n_step
    for i, (a, b) in enumerate(zip(got, traj_t)):
        # bound = measured max |diff| across all cases 3.0e-5 (3x headroom)
        np.testing.assert_allclose(
            a, b, atol=1e-4, rtol=1e-4,
            err_msg=f"step {i} latent mismatch ({which}/{method}/{sched})")


@pytest.mark.parametrize("which,method,sched,phi", [
    ("sd2v", "dpmpp2m", "karras", 0.7),   # the paper's target combination
    ("sd1",  "euler",   "uniform", 1.0),  # full rescale, first-order solver
])
def test_cfg_rescale_matches_torch(which, method, sched, phi):
    """CFG rescale (Lin et al. 2023): the std-restore + phi-lerp composes
    with the solver identically in both stacks (and actually changes the
    trajectory vs phi=0)."""
    P, ckpt, model = params_for(which)
    drng = np.random.default_rng(7)
    cond = drng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.3
    uncond = drng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.3
    x0 = np.zeros((1, 4, 8, 8), np.float32)

    traj_t, _ = TS.torch_sample(
        ckpt, P, x0, torch.from_numpy(cond), torch.from_numpy(uncond),
        rng=RngPhilox(42), n_step=5, method=method, sched=sched,
        cfg_scale=7.0, cfg_rescale=phi)

    scfg = S.SamplerConfig(method=method, sched=sched, n_step=5,
                           cfg_scale=7.0, cfg_rescale=phi)
    plan = S.make_plan(scfg, x0.shape, RngPhilox(42), nfe_per_dxdt=2)
    got = []
    S.run_sampler(model, x0, plan, cond, uncond, None, None, None, scfg, P,
                  dtype=jnp.float32,
                  step_observer=lambda i, lat: got.append(lat.copy()))
    assert len(got) == len(traj_t)
    for i, (a, b) in enumerate(zip(got, traj_t)):
        np.testing.assert_allclose(
            a, b, atol=1e-4, rtol=1e-4,
            err_msg=f"step {i} latent mismatch (rescale {phi})")

    # phi=0 diverges: rescale is live, not a no-op
    scfg0 = S.SamplerConfig(method=method, sched=sched, n_step=5,
                            cfg_scale=7.0)
    plan0 = S.make_plan(scfg0, x0.shape, RngPhilox(42), nfe_per_dxdt=2)
    base = []
    S.run_sampler(model, x0, plan0, cond, uncond, None, None, None, scfg0,
                  P, dtype=jnp.float32,
                  step_observer=lambda i, lat: base.append(lat.copy()))
    assert np.abs(base[-1] - got[-1]).max() > 1e-6


# ---- rectified flow (SD3/MMDiT) ---------------------------------------------

FLOW_CASES = [
    ("euler",   "uniform", 5, 4.0, 1.0, False),
    ("euler",   "uniform", 5, 1.0, 1.0, False),
    ("dpmpp2m", "uniform", 5, 4.0, 1.0, False),
    ("heun",    "uniform", 5, 4.0, 1.0, False),
    ("euler",   "uniform", 6, 4.0, 0.7, True),   # img2img strength
    ("dpmpp2m", "karras",  5, 4.0, 1.0, False),
    # unipc on the rectified-flow grid: the corrector composes with the
    # shifted flow sigmas exactly like on the VE grid
    ("unipc",   "uniform", 5, 4.0, 1.0, False),
    ("unipc",   "karras",  6, 4.0, 0.7, True),
]


def flow_params():
    if "sd3" not in _CACHE:
        from mlimgsynth_tpu.models import mmdit as mmdit_mod
        from mlimgsynth_tpu.testing import TINY_MMDIT as P
        spec = B.trace_spec(
            lambda ctx, x, t, c, y: mmdit_mod.mmdit_apply(ctx, x, t, c, y,
                                                          P),
            jnp.zeros((1, 8, 8, P.n_ch_in)), jnp.zeros((1,)),
            jnp.zeros((1, 7, P.d_ctx_in)), jnp.zeros((1, P.d_pooled)))
        rng = np.random.default_rng(17)
        ckpt, model = {}, {}
        for name, ps in spec.items():
            arr = _random_for_spec(rng, ps, 0.08)
            ckpt[name] = arr
            model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
        _CACHE["sd3"] = (P, ckpt, model)
    return _CACHE["sd3"]


@pytest.mark.parametrize(
    "method,sched,n_step,cfg,fti,i2i", FLOW_CASES,
    ids=[f"flow-{c[0]}-{c[1]}" + (f"-i2i{c[4]}" if c[5] else "")
         + (f"-cfg{c[3]:g}" if c[3] != 4.0 else "") for c in FLOW_CASES])
def test_flow_trajectory_matches_torch(method, sched, n_step, cfg, fti, i2i):
    """Production flow sampling (scan body, sigma*1000 timesteps,
    noise-interpolated init) vs the independent torch flow transcription;
    per-step latents must match for every solver x schedule case."""
    P, ckpt, model = flow_params()
    drng = np.random.default_rng(7)
    cond = drng.standard_normal((1, 7, P.d_ctx_in)).astype(np.float32) * 0.3
    uncond = drng.standard_normal((1, 7, P.d_ctx_in)).astype(np.float32) * 0.3
    pooled = drng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.3
    npooled = drng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.3
    x0 = (drng.standard_normal((1, P.n_ch_in, 8, 8)).astype(np.float32)
          if i2i else np.zeros((1, P.n_ch_in, 8, 8), np.float32))

    traj_t, sigmas_t = TS.torch_sample_flow(
        ckpt, P, x0, torch.from_numpy(cond), torch.from_numpy(pooled),
        torch.from_numpy(uncond) if cfg > 1 else None,
        torch.from_numpy(npooled) if cfg > 1 else None,
        rng=RngPhilox(42), n_step=n_step, method=method, sched=sched,
        cfg_scale=cfg, f_t_ini=fti)

    scfg = S.SamplerConfig(method=method, sched=sched, n_step=n_step,
                           cfg_scale=cfg, f_t_ini=fti,
                           flow_shift=P.flow_shift)
    plan = S.make_plan(scfg, x0.shape, RngPhilox(42),
                       nfe_per_dxdt=2 if cfg > 1 else 1)
    np.testing.assert_allclose(plan.sigmas, sigmas_t, rtol=2e-6, atol=2e-6,
                               err_msg="flow sigma schedule mismatch")
    got = []
    S.run_sampler(model, x0, plan, cond, uncond if cfg > 1 else None,
                  pooled, npooled if cfg > 1 else None, None, scfg, P,
                  dtype=jnp.float32,
                  step_observer=lambda i, lat: got.append(lat.copy()))
    assert len(got) == len(traj_t) == plan.n_step
    for i, (a, b) in enumerate(zip(got, traj_t)):
        np.testing.assert_allclose(
            a, b, atol=1e-4, rtol=1e-4,
            err_msg=f"flow step {i} latent mismatch ({method}/{sched})")
