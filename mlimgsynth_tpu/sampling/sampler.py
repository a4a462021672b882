"""Fully-jitted denoising loop.

The reference drives sampling from a host loop with one device round-trip per
UNet evaluation (reference: src/sampling.c:119-185, src/mlimgsynth.c:1746-1750)
and evaluates cond/uncond sequentially for CFG.  Here the whole loop is a
single ``lax.scan`` compiled once: CFG runs as one batched UNet call
(cond/uncond stacked on the batch axis), solver state lives in the scan carry,
and all noise is pre-drawn on the host with the reference's exact Philox
sequence (bit-compatible seeds) and passed in as scan inputs.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import blocks as B
from ..models import unet as unet_mod
from ..rng import RngPhilox
from . import schedule as sch
from .solvers import SolverClass, get_solver


@dataclass
class SamplerConfig:
    """Mirrors the reference's DenoiseSampler config (src/sampling.h:16-37)."""
    method: str = "euler"
    sched: str = "uniform"
    n_step: int = 20
    cfg_scale: float = 7.0
    s_ancestral: float = 0.0
    s_noise: float = 0.0
    f_t_ini: float = 1.0
    f_t_end: float = 0.0


@dataclass
class SamplingPlan:
    """Host-computed schedule + noise, ready to feed the device loop."""
    sigmas: np.ndarray
    n_step: int
    nfe_per_step: int
    s_hat: np.ndarray
    churn_sigma: np.ndarray
    s_down: np.ndarray
    s_up: np.ndarray
    t_next: np.ndarray
    noise0: np.ndarray
    churn_noise: np.ndarray
    anc_noise: np.ndarray


def make_plan(cfg: SamplerConfig, latent_shape, rng: RngPhilox,
              nfe_per_dxdt: int = 1) -> SamplingPlan:
    """Compute sigma schedule and pre-draw all noise in the reference's exact
    order (initial, then per step: churn draw, post-step ancestral draw —
    src/sampling.c:119-178)."""
    solver = get_solver(cfg.method)
    s = sch.make_schedule(cfg.n_step, cfg.sched, solver.n_fe, nfe_per_dxdt,
                          cfg.f_t_ini, cfg.f_t_end)
    plan = sch.plan_step_noise(s.sigmas, cfg.s_ancestral, cfg.s_noise)
    n_step = s.n_step

    noise0 = rng.randn_shaped(latent_shape).astype(np.float32)
    churn = np.zeros((n_step,) + tuple(latent_shape), np.float32)
    anc = np.zeros_like(churn)
    for i in range(n_step):
        if plan.churn_sigma[i] > 0:
            churn[i] = rng.randn_shaped(latent_shape)
        if plan.s_up[i] > 0:
            anc[i] = rng.randn_shaped(latent_shape)
    return SamplingPlan(
        sigmas=s.sigmas, n_step=n_step, nfe_per_step=s.nfe_per_step,
        s_hat=plan.s_hat, churn_sigma=plan.churn_sigma, s_down=plan.s_down,
        s_up=plan.s_up, t_next=plan.t_next, noise0=noise0,
        churn_noise=churn, anc_noise=anc)


def jnp_sigma_to_t(log_sigmas, sigma):
    """Jittable sigma -> continuous t (src/unet.c:315-328)."""
    ls = jnp.log(sigma)
    n = log_sigmas.shape[0]
    idx = jnp.clip(jnp.searchsorted(log_sigmas, ls, side="right") - 1, 0, n - 2)
    v1 = log_sigmas[idx]
    v2 = log_sigmas[idx + 1]
    t = idx + (ls - v1) / (v2 - v1)
    return jnp.clip(t, 0.0, n - 1)


def _mask_apply(x, x0, lmask):
    """Inpainting mask re-application (src/sampling.c:98-110)."""
    return x0 * lmask + x * (1.0 - lmask)


@functools.partial(
    jax.jit,
    static_argnames=("method", "unet_p", "use_cfg", "use_mask", "dtype"))
def denoise_loop(params: Dict[str, jnp.ndarray], x, cond, uncond, label,
                 nlabel, lmask, log_sigmas, noise0, churn_noise, anc_noise,
                 sigmas0, s_hat, churn_sigma, s_down, s_up, t_next,
                 cfg_scale, *, method: str, unet_p: unet_mod.UnetParams,
                 use_cfg: bool, use_mask: bool, dtype=jnp.bfloat16):
    """One compiled sampling run: noise-add, N solver steps, done.

    x: [N,H,W,4] f32 initial latent (zeros for txt2img).
    cond/uncond: [N,77,n_ctx]; label/nlabel: [N,ch_adm] or zeros.
    """
    solver: SolverClass = get_solver(method)
    ctx = B.Ctx(params, dtype=dtype)

    if use_cfg:
        cond_all = jnp.concatenate([cond, uncond], axis=0)
        label_all = (jnp.concatenate([label, nlabel], axis=0)
                     if unet_p.ch_adm_in else None)
    else:
        cond_all = cond
        label_all = label if unet_p.ch_adm_in else None

    n = x.shape[0]

    def dxdt(xv, sigma):
        t = jnp_sigma_to_t(log_sigmas, sigma)
        if use_cfg:
            xb = jnp.concatenate([xv, xv], axis=0)
            d = unet_mod.denoise(ctx, xb, sigma, t, cond_all, label_all,
                                 unet_p)
            d_c, d_u = d[:n], d[n:]
            f = cfg_scale
            return d_c * f + d_u * (1.0 - f)
        return unet_mod.denoise(ctx, xv, sigma, t, cond_all, label_all,
                                unet_p)

    # snapshot the un-noised latent for inpainting (src/sampling.c:129-135)
    x = x.astype(jnp.float32)
    x0_keep = x if use_mask else None
    x = x + noise0 * sigmas0
    if use_mask:
        x = _mask_apply(x, x0_keep, lmask)

    state = solver.init_state(x)
    n_step = s_down.shape[0]

    def body(carry, inp):
        x, t, state = carry
        i, c_noise, a_noise = inp
        # stochastic churn (src/sampling.c:138-151)
        churn = churn_sigma[i]
        x = x + c_noise * churn
        if use_mask:
            x = jnp.where(churn > 0, _mask_apply(x, x0_keep, lmask), x)
        t = jnp.where(churn > 0, s_hat[i], t)
        # solver step
        x, state = solver.step(dxdt, x, state, i, t, s_down[i])
        # post-step ancestral noise (src/sampling.c:170-174)
        x = x + a_noise * s_up[i]
        t = jnp.where(s_up[i] > 0, t_next[i], s_down[i])
        if use_mask:
            x = _mask_apply(x, x0_keep, lmask)
        return (x, t, state), None

    (x, _, _), _ = jax.lax.scan(
        body, (x, sigmas0, state),
        (jnp.arange(n_step), churn_noise, anc_noise))
    return x


def run_sampler(params, x_init, plan: SamplingPlan, cond, uncond, label,
                nlabel, lmask, cfg: SamplerConfig,
                unet_p: unet_mod.UnetParams, dtype=jnp.bfloat16):
    """Host wrapper: package the plan and invoke the compiled loop."""
    use_cfg = cfg.cfg_scale > 1
    use_mask = lmask is not None
    n = x_init.shape[0]
    zeros_label = jnp.zeros((n, max(unet_p.ch_adm_in, 1)), jnp.float32)
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    return denoise_loop(
        params, f32(x_init),
        f32(cond), f32(uncond if uncond is not None else cond),
        f32(label) if label is not None else zeros_label,
        f32(nlabel) if nlabel is not None else zeros_label,
        f32(lmask) if use_mask else jnp.zeros_like(f32(x_init)),
        jnp.asarray(sch.get_log_sigmas()),
        f32(plan.noise0), f32(plan.churn_noise), f32(plan.anc_noise),
        jnp.float32(plan.sigmas[0]), f32(plan.s_hat), f32(plan.churn_sigma),
        f32(plan.s_down), f32(plan.s_up), f32(plan.t_next),
        jnp.float32(cfg.cfg_scale),
        method=get_solver(cfg.method).name, unet_p=unet_p, use_cfg=use_cfg,
        use_mask=use_mask, dtype=dtype)
