"""k-diffusion ODE solvers as jittable step functions.

Each solver advances ``x`` from sigma ``t_cur`` to ``t_next`` given a
``dxdt(x, sigma)`` callable (the CFG-combined denoiser derivative
``(x - denoised)/sigma``).  The math mirrors the reference solvers
(reference: src/solvers.c): Euler, Heun (Karras Algo1), Taylor3 (the
reference author's 3rd-order history method), DPM++(2M) and DPM++(2S).

State is a dict of arrays carried through ``lax.scan``; ``i_step`` is the
0-based solver step index (a traced int32).  All last-step special cases
(``t_next == 0``) are handled with ``lax.cond`` so the extra function
evaluation of the 2nd-order methods is genuinely skipped at runtime.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SolverClass:
    name: str
    n_fe: int
    init_state: Callable  # (x) -> dict
    step: Callable        # (dxdt, x, state, i_step, t_cur, t_next) -> (x, state)


def _euler_init(x):
    return {}


def _euler_step(dxdt, x, state, i_step, t_cur, t_next):
    dt = t_next - t_cur
    dx = dxdt(x, t_cur)
    return x + dx * dt, state


def _heun_init(x):
    return {}


def _heun_step(dxdt, x, state, i_step, t_cur, t_next):
    dt = t_next - t_cur
    dx = dxdt(x, t_cur)
    x1 = x + dx * dt

    def last(_):
        return x1

    def correct(_):
        d1 = dxdt(x1, t_next)
        return x + (dx + d1) * (0.5 * dt)

    x = jax.lax.cond(t_next > 0, correct, last, None)
    return x, state


def _taylor3_init(x):
    return {
        "dt_prev": jnp.zeros((), x.dtype),
        "dp1": jnp.zeros_like(x),
        "dp2": jnp.zeros_like(x),
    }


def _taylor3_step(dxdt, x, state, i_step, t_cur, t_next):
    dt = t_next - t_cur
    dx = dxdt(x, t_cur)
    x = x + dx * dt
    idtp = jnp.where(i_step >= 1, 1.0 / state["dt_prev"], 0.0)
    f2 = jnp.where(i_step >= 1, dt * dt / 2, 0.0)
    f3 = jnp.where(i_step >= 2, dt * dt * dt / 6, 0.0)
    d2 = (dx - state["dp1"]) * idtp
    d3 = (d2 - state["dp2"]) * idtp
    x = x + d2 * f2 + d3 * f3
    new_state = {"dt_prev": dt, "dp1": dx, "dp2": d2}
    return x, new_state


def _dpmpp2m_init(x):
    return {"h_last": jnp.zeros((), x.dtype), "dprev": jnp.zeros_like(x)}


def _dpmpp2m_step(dxdt, x, state, i_step, t_cur, t_next):
    a = t_next / t_cur
    h = -jnp.log(a)
    c = h / (2 * state["h_last"])
    c = jnp.where(jnp.logical_or(i_step == 0, jnp.logical_not(t_next > 0)), 0.0, c)
    dx = dxdt(x, t_cur)
    d0 = x - t_cur * dx
    d = (1 + c) * d0 - c * state["dprev"]
    x = a * x + (1 - a) * d
    return x, {"h_last": h, "dprev": d0}


def _dpmpp2s_init(x):
    return {}


def _dpmpp2s_step(dxdt, x, state, i_step, t_cur, t_next):
    dx = dxdt(x, t_cur)

    def last(_):
        return x + dx * (t_next - t_cur)

    def mid(_):
        t1 = jnp.sqrt(t_next * t_cur)
        dt1 = t1 - t_cur
        a = t_next / t_cur
        x1 = x + dx * dt1
        dx1 = dxdt(x1, t1)
        d = x1 - t1 * dx1
        return a * x + (1 - a) * d

    x_new = jax.lax.cond(t_next > 0, mid, last, None)
    return x_new, state


EULER = SolverClass("euler", 1, _euler_init, _euler_step)
HEUN = SolverClass("heun", 2, _heun_init, _heun_step)
TAYLOR3 = SolverClass("taylor3", 1, _taylor3_init, _taylor3_step)
DPMPP2M = SolverClass("dpmpp2m", 1, _dpmpp2m_init, _dpmpp2m_step)
DPMPP2S = SolverClass("dpmpp2s", 2, _dpmpp2s_init, _dpmpp2s_step)

# DPM++(2M) SDE, midpoint variant (beyond-reference: listed under the
# reference's Future plans; spec: k-diffusion sampling.py
# sample_dpmpp_2m_sde).  The stochastic update decomposes EXACTLY into the
# deterministic dpmpp2m step taken to sigma_down = s1*(s1/s0)^eta plus
# post-step noise sigma_up = s1*sqrt(1-(s1/s0)^(2*eta)):
#   x-coefficient     (s1/s0)*exp(-eta*h) = (s1/s0)^(1+eta) = sigma_down/s0
#     matches dpmpp2m's a with t_next=sigma_down;
#   denoised coeff    -expm1(-h-eta*h)    = 1 - a;
#   midpoint 2nd-order 0.5*(1-a)*(h/h_last)*(d-d_prev) = (1-a)*c*(d-d_prev)
#     with c = h'/(2*h'_last) where h' = (1+eta)*h — the (1+eta) cancels in
#     the ratio, so the stored-h state stays consistent.
# The per-step noise rides the sampler's ancestral slot with the SDE
# sigma_down/up split (sampling/schedule.py plan_step_noise mode="sde");
# noise comes from the same Philox stream (deterministic per seed) instead
# of k-diffusion's BrownianTree — documented divergence.
DPMPP2M_SDE = SolverClass("dpmpp2m_sde", 1, _dpmpp2m_init, _dpmpp2m_step)

# Latent-consistency sampling (beyond-reference; diffusers LCMScheduler
# semantics): each step evaluates the consistency function once —
# boundary-scaled x0 prediction c_out*x0 + c_skip*c_in*x with
# sigma_data=0.5 and timestep_scaling=10 — then fully re-noises to the
# next sigma.  The step lives in the sampler BODY (sampler._make_body):
# the boundary scalings need the sigma->timestep table, which solvers
# don't see; the re-noise rides the ancestral noise slot
# (schedule.plan_step_noise lcm mode).  The euler step here is a
# placeholder that the body never calls for this method.
LCM = SolverClass("lcm", 1, _euler_init, _euler_step)

# UniPC (beyond-reference; Zhao et al. 2023, arXiv:2302.04867) — the
# predictor-corrector multistep method, order 2, bh2 variant, data (x0)
# prediction, transcribed into k-diffusion sigma space (lambda = -ln(sigma),
# alpha == 1):
#   predictor: the UniPC-2 bh2 predictor reduces ALGEBRAICALLY to the
#     DPM++(2M) update — rhos_p = [1/2], D1_0 = (m_prev - m_t)/r0 with
#     r0 = -h_prev/h gives x' = a*x + (1-a)*((1+c)*m_t - c*m_prev),
#     c = h/(2*h_prev) — so the step below reuses that exact form;
#   corrector: at each arrival point the fresh model output m_t corrects
#     the PREVIOUS prediction before the next one departs:
#       x_c = a_c*last_x + (1-a_c)*m_prev - B_h*corr,   B_h = expm1(-h_p)
#     with [rho0, rho1] solved from [[1,1],[r0,1]] @ rhos = [b1,b2]
#     (order 2, i>=2) or rhos = [1/2] (order 1, i==1), matching the
#     general-order linear system of the paper (the torch oracle in
#     tests/torch_sampler.py builds that system literally and solves it).
# The corrector is applied in DELTA form (x + (corrected - predicted)) and
# only when this step's t_cur equals the previous prediction's target
# sigma: stochastic churn re-noises to s_hat and ancestral steps land on
# t_next != s_down, where the correction's premises do not hold — there
# UniPC degrades gracefully to plain DPM++(2M).  1 model eval per step.


def _unipc_init(x):
    z = jnp.zeros_like(x)
    s = jnp.zeros((), x.dtype)
    return {"m_prev": z, "m_prev2": z, "last_x": z, "x_pred": z,
            "h_prev": s, "h_prev2": s, "t_pred": s}


def _unipc_step(dxdt, x, state, i_step, t_cur, t_next):
    dx = dxdt(x, t_cur)
    m_t = x - t_cur * dx

    # ---- bh2 corrector of the arrival point (delta form) ----
    use_corr = jnp.logical_and(i_step >= 1, t_cur == state["t_pred"])
    hp = jnp.where(state["h_prev"] > 0, state["h_prev"], 1.0)
    a_c = jnp.exp(-hp)
    B_h = a_c - 1.0                      # expm1(-h_p): bh2's B(h)
    hh = -hp
    k1 = B_h / hh - 1.0                  # h_phi_k for i=1
    b1 = k1 / B_h
    b2 = (k1 / hh - 0.5) * 2.0 / B_h     # h_phi_k for i=2, times 2!
    r0 = jnp.where(i_step >= 2, -state["h_prev2"] / hp, -1.0)
    den = 1.0 - r0
    rho0 = (b1 - b2) / den
    rho1 = (b2 - r0 * b1) / den
    D1_t = m_t - state["m_prev"]
    D1_p = (state["m_prev2"] - state["m_prev"]) / r0
    corr = jnp.where(i_step >= 2, rho0 * D1_p + rho1 * D1_t, 0.5 * D1_t)
    x_t_ = a_c * state["last_x"] + (1 - a_c) * state["m_prev"]
    delta = (x_t_ - B_h * corr) - state["x_pred"]
    x_use = jnp.where(use_corr, x + delta, x)

    # ---- order-2 bh2 predictor == the DPM++(2M) update from x_use ----
    a = t_next / t_cur
    h = -jnp.log(a)
    c = h / (2 * hp)
    c = jnp.where(jnp.logical_or(i_step == 0,
                                 jnp.logical_not(t_next > 0)), 0.0, c)
    d = (1 + c) * m_t - c * state["m_prev"]
    x_new = a * x_use + (1 - a) * d
    return x_new, {"m_prev": m_t, "m_prev2": state["m_prev"],
                   "last_x": x_use, "x_pred": x_new,
                   "h_prev": h, "h_prev2": state["h_prev"],
                   "t_pred": t_next}


UNIPC = SolverClass("unipc", 1, _unipc_init, _unipc_step)

SOLVERS: Dict[str, SolverClass] = {
    s.name: s for s in (EULER, HEUN, TAYLOR3, DPMPP2M, DPMPP2S, DPMPP2M_SDE,
                        LCM, UNIPC)
}

# Method ids matching MLIS_Method (include/mlimgsynth.h); 6+ are this
# build's additive extensions.
METHOD_IDS = {1: "euler", 2: "heun", 3: "taylor3", 4: "dpmpp2m",
              5: "dpmpp2s", 6: "dpmpp2m_sde", 7: "lcm", 8: "unipc"}


def get_solver(method) -> SolverClass:
    if isinstance(method, int):
        method = METHOD_IDS.get(method)
    if isinstance(method, str):
        cls = SOLVERS.get(method)
        if cls is not None:
            return cls
    raise ValueError(f"invalid sampling method {method!r}")
