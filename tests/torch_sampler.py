"""Independent torch transcription of the reference sampler machinery.

This is the end-to-end trajectory ORACLE (VERDICT r2 item 1): sigma tables,
uniform/Karras schedules, c_in / v-param scalings, CFG mixing, churn and
ancestral noise order, and all five solvers, transcribed directly from the
reference C sources —

  * sigma table + t<->sigma interpolation:  src/unet.c:283-334
  * schedule construction + step loop:      src/sampling.c:28-185
  * input/output scalings:                  src/unet.c:460-498
  * CFG combination:                        src/mlimgsynth.c:1571-1587
  * solvers (euler/heun/taylor3/2m/2s):     src/solvers.c:82-296

— NOT from mlimgsynth_tpu's own schedule.py / solvers.py / sampler.py, so a
transcription error in either stack shows up as a trajectory mismatch.
The UNet forward is tests/torch_ref.torch_unet (pure torch kernels, itself
independently parity-tested).  Noise comes from mlimgsynth_tpu.rng.RngPhilox,
which is golden-tested against the reference Philox on fixed vectors, so
sharing it does not couple the two sampler implementations.

Everything here is eager float32 torch — no JAX imports.
"""
import math

import numpy as np
import torch

from torch_ref import torch_unet


# ---- sigma table + interpolation (src/unet.c:283-334) ----------------------

def make_log_sigmas(n_step_train=1000, linear_start=0.00085,
                    linear_end=0.0120):
    """Beta-linear log-sigma table; double-precision accumulation into a
    float32 table, exactly like unet_params_init (src/unet.c:283-303)."""
    b = math.sqrt(linear_start)
    e = math.sqrt(linear_end)
    f = (e - b) / (n_step_train - 1)
    out = np.empty(n_step_train, np.float32)
    alpha_cumprod = 1.0
    for i in range(n_step_train):
        beta = b + f * i
        alpha_cumprod *= 1.0 - beta * beta
        out[i] = math.log(math.sqrt((1.0 - alpha_cumprod) / alpha_cumprod))
    return out


def t_to_sigma(log_sigmas, t):
    """linear_interp + exp (src/unet.c:305-312, 329-334)."""
    n = len(log_sigmas)
    ti = min(max(int(t), 0), n - 1)
    v1 = log_sigmas[ti]
    v2 = log_sigmas[ti + 1] if ti + 1 < n else v1
    return math.exp(v1 * (ti + 1 - t) + v2 * (t - ti))


def sigma_to_t(log_sigmas, sigma):
    """bisect_right + linear_est (src/unet.c:314-328)."""
    v = math.log(sigma)
    n = len(log_sigmas)
    lo, hi = 0, n
    while lo < hi:                     # first index with vec[i] > v
        mid = (lo + hi) // 2
        if log_sigmas[mid] > v:
            hi = mid
        else:
            lo = mid + 1
    idx = lo - 1
    if idx + 1 >= n:
        return float(n - 1)
    idx = max(idx, 0)
    v1, v2 = log_sigmas[idx], log_sigmas[idx + 1]
    return idx + (v - v1) / (v2 - v1)


# ---- schedule construction (src/sampling.c:28-96) ---------------------------

def make_sigmas(log_sigmas, n_step, sched="uniform", solver_n_fe=1,
                f_t_ini=1.0, f_t_end=0.0, n_step_train=1000):
    if n_step < 1:
        n_step = 20
    if solver_n_fe > 1:
        n_step = (n_step + solver_n_fe - 1) // solver_n_fe
    if not (f_t_ini > 0):
        f_t_ini = 1.0
    n_step = int(n_step * (f_t_ini - f_t_end) + 0.5)
    if n_step < 1:
        n_step = 1

    t_ini = (n_step_train - 1) * f_t_ini
    t_end = (n_step_train - 1) * f_t_end
    sigmas = np.zeros(n_step + 1, np.float32)
    if sched == "uniform":
        b = t_ini
        f = (t_end - t_ini) / (n_step - 1) if n_step > 1 else 0.0
        for i in range(n_step):
            sigmas[i] = t_to_sigma(log_sigmas, b + i * f)
    elif sched == "karras":
        smin = t_to_sigma(log_sigmas, t_end)
        smax = t_to_sigma(log_sigmas, t_ini)
        p = 7.0
        sminp = smin ** (1 / p)
        smaxp = smax ** (1 / p)
        b = smaxp
        f = (sminp - smaxp) / (n_step - 1) if n_step > 1 else 0.0
        for i in range(n_step):
            sigmas[i] = (b + i * f) ** p
    elif sched == "exponential":
        # k-diffusion get_sigmas_exponential: linspace in log sigma
        smin = t_to_sigma(log_sigmas, t_end)
        smax = t_to_sigma(log_sigmas, t_ini)
        for i in range(n_step):
            w = i / (n_step - 1) if n_step > 1 else 0.0
            sigmas[i] = math.exp(
                math.log(smax) * (1 - w) + math.log(smin) * w)
    elif sched == "sgm_uniform":
        # sgm convention: n+1 uniform t points, last dropped
        for i in range(n_step):
            sigmas[i] = t_to_sigma(
                log_sigmas, t_ini + i * (t_end - t_ini) / n_step)
    elif sched == "beta":
        # Beta(0.6, 0.6) ppf grid, inverted NUMERICALLY from the pdf (the
        # production side uses scipy.stats.beta.ppf — independent path)
        smin = t_to_sigma(log_sigmas, t_end)
        smax = t_to_sigma(log_sigmas, t_ini)
        a_, b_ = 0.6, 0.6
        # substitute t = sin^2(theta): the integrand becomes the BOUNDED
        # 2 sin^(2a-1) cos^(2b-1), so the trapezoid CDF converges fast
        theta = np.linspace(0.0, math.pi / 2, 400001)
        f = 2.0 * np.sin(theta) ** (2 * a_ - 1) * np.cos(theta) ** (2 * b_ - 1)
        cdf = np.concatenate([[0.0], np.cumsum(
            (f[1:] + f[:-1]) * 0.5 * np.diff(theta))])
        cdf /= cdf[-1]
        tgrid = np.sin(theta) ** 2
        for i in range(n_step):
            u = 1.0 - (i / (n_step - 1) if n_step > 1 else 0.0)
            ppf = float(np.interp(u, cdf, tgrid)) if 0 < u < 1 else u
            sigmas[i] = smin + ppf * (smax - smin)
    elif sched == "lcm":
        # diffusers LCMScheduler.set_timesteps: the distillation origin
        # grid (original_inference_steps=50) subsampled with
        # linspace(0, origin, k, endpoint=False).floor(); strength
        # (f_t_ini) shortens the grid like the img2img pipelines.
        origin = 50
        skipping = n_step_train // origin
        origin_eff = max(1, int(origin * min(f_t_ini, 1.0) + 0.5))
        if n_step > origin_eff:
            n_step = origin_eff
        sigmas = np.zeros(n_step + 1, np.float32)
        grid = [i * skipping - 1 for i in range(1, origin_eff + 1)][::-1]
        for i in range(n_step):
            idx = int(math.floor(i * origin_eff / n_step))
            sigmas[i] = t_to_sigma(log_sigmas, float(grid[idx]))
    else:
        raise ValueError(sched)
    return sigmas


# ---- denoiser: c_in / v-param / CFG (src/unet.c:460-498, mlimgsynth.c:1571) -

class TorchDenoiser:
    """dxdt callback: eps-space derivative with k-diffusion scalings."""

    def __init__(self, params, P, cond, label, uncond, nlabel, cfg_scale,
                 log_sigmas, cfg_rescale=0.0, cnet_hint=None,
                 cnet_strength=1.0):
        self.params = params
        self.P = P
        self.cond = cond
        self.label = label
        self.uncond = uncond
        self.nlabel = nlabel
        self.cfg_scale = cfg_scale
        self.cfg_rescale = cfg_rescale
        self.log_sigmas = log_sigmas
        self.cnet_hint = cnet_hint           # NCHW [1,3,H,W] f32 in [0,1]
        self.cnet_strength = cnet_strength
        self.nfe = 0

    def _run(self, x, sigma, cond, label):
        t = sigma_to_t(self.log_sigmas, sigma)
        c_in = 1.0 / math.sqrt(sigma * sigma + 1.0)
        tt = torch.full((x.shape[0],), t, dtype=torch.float32)
        control = None
        if self.cnet_hint is not None:
            # ControlNet copy runs on the same c_in-scaled input as the
            # UNet (models/unet.py:259, src/control.c behavior anchor)
            from torch_ref import torch_controlnet
            control = torch_controlnet(
                self.params, x * c_in, tt, cond, label, self.cnet_hint,
                self.P, strength=self.cnet_strength)
        dx = torch_unet(self.params, x * c_in, tt, cond, label, self.P,
                        control=control)
        self.nfe += 1
        if self.P.vparam:
            c_skip = sigma / (sigma * sigma + 1.0)
            c_out = 1.0 / math.sqrt(sigma * sigma + 1.0)
            dx = dx * c_out + x * c_skip
        return dx

    def dxdt(self, x, sigma):
        dx = self._run(x, sigma, self.cond, self.label)
        f = self.cfg_scale
        if f > 1:
            dxc = dx
            dxu = self._run(x, sigma, self.uncond, self.nlabel)
            dx = dx * f + dxu * (1.0 - f)
            phi = self.cfg_rescale
            if phi > 0:
                # Lin et al. 2023 eq. 15-16 (diffusers rescale_noise_cfg):
                # restore the conditional prediction's per-sample std,
                # then lerp by phi.  torch .std() is unbiased, matching
                # the ddof=1 production convention.
                dims = list(range(1, dx.ndim))
                std_c = dxc.std(dim=dims, keepdim=True)
                std_o = dx.std(dim=dims, keepdim=True)
                dx = phi * (dx * std_c / std_o) + (1.0 - phi) * dx
        return dx


# ---- solvers (src/solvers.c:82-296) -----------------------------------------

class TorchSolver:
    """Transcribes the Solver struct: persistent t / i_step and the tmp-slot
    state that the C reuses across steps (dt_prev/dp1/dp2 for taylor3,
    h_last/dprev for dpmpp2m live in tmp slots that persist)."""

    def __init__(self, method, dxdt):
        self.method = method
        self.dxdt = dxdt
        self.t = 0.0
        self.i_step = 0
        self.dt_prev = 0.0
        self.dp1 = None
        self.dp2 = None
        self.h_last = 0.0
        self.dprev = None
        # UniPC history (predictions, not corrections)
        self.u_m0 = None       # model output (x0 pred) at the last step
        self.u_m1 = None       # ... at the step before that
        self.u_hprev = 0.0     # h of the last prediction
        self.u_hprev2 = 0.0
        self.u_lastx = None    # sample the last prediction departed from
        self.u_s0prev = 0.0    # sigma it departed from
        self.u_xpred = None    # the prediction itself
        self.u_tpred = -1.0    # sigma it predicted to
        self.n_fe = {"euler": 1, "heun": 2, "taylor3": 1,
                     "dpmpp2m": 1, "dpmpp2s": 2, "unipc": 1}[method]

    def step(self, t, x):
        x = getattr(self, "_step_" + self.method)(t, x)
        self.t = t
        self.i_step += 1
        return x

    def _step_euler(self, t, x):
        dt = t - self.t
        return x + self.dxdt(x, self.t) * dt

    def _step_heun(self, t, x):
        dt = t - self.t
        dx = self.dxdt(x, self.t)
        x1 = x + dx * dt
        if not (t > 0):            # last step: just euler
            return x1
        d1 = self.dxdt(x1, t)
        return x + (dx + d1) * (0.5 * dt)

    def _step_taylor3(self, t, x):
        dt = t - self.t
        dx = self.dxdt(x, self.t)
        x = x + dx * dt
        idtp = 1.0 / self.dt_prev if self.i_step >= 1 else 0.0
        f2 = dt * dt / 2 if self.i_step >= 1 else 0.0
        f3 = dt * dt * dt / 6 if self.i_step >= 2 else 0.0
        dp1 = self.dp1 if self.dp1 is not None else torch.zeros_like(x)
        dp2 = self.dp2 if self.dp2 is not None else torch.zeros_like(x)
        d2 = (dx - dp1) * idtp
        d3 = (d2 - dp2) * idtp
        x = x + d2 * f2 + d3 * f3
        self.dp1, self.dp2, self.dt_prev = dx, d2, dt
        return x

    def _step_dpmpp2m(self, t, x):
        a = t / self.t
        # C: log(0) quietly yields -inf; h is then unused because c is
        # forced to 0 on the last step
        h = -math.log(a) if a > 0 else math.inf
        c = h / (2 * self.h_last) if self.h_last else 0.0
        if self.i_step == 0 or not (t > 0):
            c = 0.0
        dx = self.dxdt(x, self.t)
        d0 = x - self.t * dx
        dprev = self.dprev if self.dprev is not None else torch.zeros_like(x)
        d = (1 + c) * d0 - c * dprev
        x = a * x + (1 - a) * d
        self.dprev = d0
        self.h_last = h
        return x

    def _step_unipc(self, t, x):
        """UniPC order-2, bh2, x0-prediction (arXiv:2302.04867), following
        the diffusers UniPCMultistepScheduler STRUCTURE: the corrector's
        rhos are solved from the literal R/b linear system (float64
        torch.linalg.solve), the predictor uses the rhos_p=[1/2] order-2
        special case; sigma-space with alpha == 1 so lambda = -ln(sigma).
        Deliberately NOT the production closed form (solvers.py folds the
        predictor into the DPM++(2M) c-coefficient and the corrector into
        precomputed 2x2-inverse scalars) — the two derivations cross-check.
        The corrector only fires when this step starts exactly at the
        previous prediction's target (churn/ancestral noise moves sigma,
        production gates identically)."""
        s0 = self.t
        dx = self.dxdt(x, s0)
        m_t = x - s0 * dx

        # ---- corrector for the arrival at s0 ----
        if self.u_m0 is not None and s0 == self.u_tpred:
            h = self.u_hprev
            hh = -h
            B_h = math.expm1(hh)                      # bh2
            x_t_ = (s0 / self.u_s0prev) * self.u_lastx + (-B_h) * self.u_m0
            D1_t = m_t - self.u_m0
            if self.u_m1 is not None:                 # order-2 corrector
                rks = [-self.u_hprev2 / h, 1.0]
                D1_p = (self.u_m1 - self.u_m0) / rks[0]
                R, b = [], []
                h_phi_k = B_h / hh - 1.0
                fact = 1
                for i in (1, 2):
                    R.append([r ** (i - 1) for r in rks])
                    b.append(h_phi_k * fact / B_h)
                    fact *= i + 1
                    h_phi_k = h_phi_k / hh - 1.0 / fact
                rhos = torch.linalg.solve(
                    torch.tensor(R, dtype=torch.float64),
                    torch.tensor(b, dtype=torch.float64))
                corr = float(rhos[0]) * D1_p + float(rhos[1]) * D1_t
            else:                                     # order-1: rhos=[1/2]
                corr = 0.5 * D1_t
            # delta form: the correction rides on top of whatever the
            # sampler did to x after the prediction (mask mixing)
            x = x + (x_t_ - B_h * corr) - self.u_xpred

        # ---- predictor s0 -> t ----
        if t > 0:
            a = t / s0
            h_new = math.log(s0) - math.log(t)
            x_new = a * x + (1 - a) * m_t
            if self.u_m0 is not None:
                B_h = math.expm1(-h_new)
                r0 = -self.u_hprev / h_new
                D1_0 = (self.u_m0 - m_t) / r0
                x_new = x_new - B_h * 0.5 * D1_0
        else:
            h_new = math.inf
            x_new = m_t

        self.u_m1, self.u_m0 = self.u_m0, m_t
        self.u_hprev2, self.u_hprev = self.u_hprev, h_new
        self.u_lastx, self.u_s0prev = x, s0
        self.u_xpred, self.u_tpred = x_new, t
        return x_new

    def _step_dpmpp2s(self, t, x):
        dx = self.dxdt(x, self.t)
        if not (t > 0):            # last step: just euler
            return x + dx * (t - self.t)
        t1 = math.sqrt(t * self.t)
        dt1 = t1 - self.t
        a = t / self.t
        x1 = x + dx * dt1
        dx1 = self.dxdt(x1, t1)
        d = x1 - t1 * dx1
        return a * x + (1 - a) * d


# ---- sampling loop (src/sampling.c:98-185) -----------------------------------

def torch_sample(params, P, x0, cond, uncond=None, label=None, nlabel=None,
                 *, rng, n_step, method="euler", sched="uniform",
                 cfg_scale=7.0, s_ancestral=0.0, s_noise=0.0,
                 f_t_ini=1.0, f_t_end=0.0, lmask=None, cfg_rescale=0.0,
                 cnet_hint=None, cnet_strength=1.0):
    """Full denoise trajectory; returns the list of per-step latents (NCHW
    numpy f32, one after each dnsamp_step) plus the sigma schedule.

    ``x0`` is the initial latent (zeros for txt2img, encoded image for
    img2img) as NCHW numpy; ``rng`` is an RngPhilox whose draw points follow
    dnsamp_noise_add exactly (initial, churn, post-step ancestral —
    src/sampling.c:119-178)."""
    log_sigmas = make_log_sigmas(P.n_step_train)
    n_fe = {"euler": 1, "heun": 2, "taylor3": 1, "dpmpp2m": 1,
            "dpmpp2s": 2, "dpmpp2m_sde": 1, "lcm": 1, "unipc": 1}[method]
    sigmas = make_sigmas(log_sigmas, n_step, sched, n_fe, f_t_ini, f_t_end,
                         P.n_step_train)
    n_step = len(sigmas) - 1

    den = TorchDenoiser(params, P, cond, label, uncond, nlabel, cfg_scale,
                        log_sigmas, cfg_rescale=cfg_rescale,
                        cnet_hint=cnet_hint, cnet_strength=cnet_strength)

    if method == "lcm":
        # Independent transcription of diffusers LCMScheduler.step: x0
        # prediction through the boundary scalings (sigma_data 0.5,
        # timestep_scaling 10; the scalings act on the DDPM-space sample
        # sqrt(alpha)*x_edm = c_in*x_edm), then a full re-noise to the
        # next timestep's sigma with a fresh draw (none after the last).
        x = torch.from_numpy(np.asarray(x0, np.float32)).clone()
        x_keep = x.clone() if lmask is not None else None
        m = torch.from_numpy(np.asarray(lmask, np.float32)) \
            if lmask is not None else None
        traj = []
        for s in range(n_step):
            if s == 0:
                n = rng.randn_shaped(tuple(x.shape)).astype(np.float32)
                x = x + torch.from_numpy(n) * float(sigmas[0])
                if m is not None:
                    x = x_keep * m + x * (1.0 - m)
            s1, s2 = float(sigmas[s]), float(sigmas[s + 1])
            with torch.no_grad():
                dx = den.dxdt(x, s1)
            x0p = x - s1 * dx
            ts = sigma_to_t(log_sigmas, s1) * 10.0
            c_skip = 0.5 ** 2 / (ts * ts + 0.5 ** 2)
            c_out = ts / math.sqrt(ts * ts + 0.5 ** 2)
            c_in = 1.0 / math.sqrt(s1 * s1 + 1.0)
            d = c_out * x0p + c_skip * (c_in * x)
            if s2 > 0:
                n = rng.randn_shaped(tuple(x.shape)).astype(np.float32)
                x = d + torch.from_numpy(n) * s2
            else:
                x = d
            if m is not None:
                x = x_keep * m + x * (1.0 - m)
            traj.append(x.numpy().copy())
        return traj, sigmas

    if method == "dpmpp2m_sde":
        # Independent transcription of k-diffusion sampling.py
        # sample_dpmpp_2m_sde (midpoint solver) in its original
        # exp/expm1 algebra — deliberately NOT the sigma_down/up
        # decomposition the production sampler uses, so the two paths
        # cross-check each other.  eta rides s_ancestral (default 1),
        # the noise multiplier rides s_noise (default 1); noise draws
        # follow the sampler's Philox order (initial, then one draw
        # after each noised step).
        eta = s_ancestral if s_ancestral > 0 else 1.0
        nmult = s_noise if s_noise > 0 else 1.0
        x = torch.from_numpy(np.asarray(x0, np.float32)).clone()
        x_keep = x.clone() if lmask is not None else None
        m = torch.from_numpy(np.asarray(lmask, np.float32)) \
            if lmask is not None else None
        old_denoised = None
        h_last = 0.0
        traj = []
        for s in range(n_step):
            if s == 0:
                n = rng.randn_shaped(tuple(x.shape)).astype(np.float32)
                x = x + torch.from_numpy(n) * float(sigmas[0])
                if m is not None:
                    x = x_keep * m + x * (1.0 - m)
            s1, s2 = float(sigmas[s]), float(sigmas[s + 1])
            with torch.no_grad():
                dx = den.dxdt(x, s1)
            denoised = x - s1 * dx
            if not (s2 > 0):
                x = denoised
            else:
                h = math.log(s1) - math.log(s2)   # = -log(s2)-(-log(s1))
                eta_h = eta * h
                x = ((s2 / s1) * math.exp(-eta_h) * x
                     + (-math.expm1(-h - eta_h)) * denoised)
                if old_denoised is not None:
                    r = h_last / h
                    x = x + (0.5 * (-math.expm1(-h - eta_h)) * (1.0 / r)
                             * (denoised - old_denoised))
                if eta > 0 and s + 1 != n_step:
                    sig_up = s2 * math.sqrt(-math.expm1(-2.0 * eta_h)) * nmult
                    n = rng.randn_shaped(tuple(x.shape)).astype(np.float32)
                    x = x + torch.from_numpy(n) * sig_up
                old_denoised = denoised
                h_last = h
            if m is not None:
                x = x_keep * m + x * (1.0 - m)
            traj.append(x.numpy().copy())
        return traj, sigmas
    sol = TorchSolver(method, den.dxdt)
    sol.t = float(sigmas[0])

    x = torch.from_numpy(np.asarray(x0, np.float32)).clone()
    x_keep = x.clone() if lmask is not None else None
    m = torch.from_numpy(np.asarray(lmask, np.float32)) \
        if lmask is not None else None

    def noise_add(x, sigma):
        n = rng.randn_shaped(tuple(x.shape)).astype(np.float32)
        return x + torch.from_numpy(n) * sigma

    def mask_apply(x):
        return x_keep * m + x * (1.0 - m)

    traj = []
    for s in range(n_step):
        s_up = 0.0
        s_down = float(sigmas[s + 1])

        if s == 0:
            x = noise_add(x, float(sigmas[0]))
            if m is not None:
                x = mask_apply(x)

        if s_noise > 0 and s > 0:
            s_curr = float(sigmas[s])
            s_hat = s_curr * math.sqrt(2) * s_noise
            extra = math.sqrt(s_hat * s_hat - s_curr * s_curr)
            x = noise_add(x, extra)
            if m is not None:
                x = mask_apply(x)
            sol.t = s_hat

        if s_ancestral > 0:
            s1 = float(sigmas[s])
            s2 = float(sigmas[s + 1])
            s_up = math.sqrt((s2 * s2) * (s1 * s1 - s2 * s2) / (s1 * s1))
            s_up *= s_ancestral
            s_up = min(s_up, s2)
            s_down = math.sqrt(s2 * s2 - s_up * s_up)

        with torch.no_grad():
            x = sol.step(s_down, x)

        if s_up > 0 and s + 1 != n_step:
            x = noise_add(x, s_up)
            sol.t = float(sigmas[s + 1])

        if m is not None:
            x = mask_apply(x)

        traj.append(x.numpy().copy())
    return traj, sigmas


# ---- rectified flow (SD3/MMDiT; beyond-reference) ---------------------------

def make_log_sigmas_flow(shift=3.0, n_step_train=1000):
    """Flow sigma table, transcribed from the public flow-matching
    scheduler convention (sigma = t/1000 shifted by
    shift*s/(1+(shift-1)*s)) — independently of schedule.log_sigmas_flow."""
    out = np.empty(n_step_train, np.float32)
    for i in range(n_step_train):
        u = (i + 1) / n_step_train
        out[i] = math.log(shift * u / (1.0 + (shift - 1.0) * u))
    return out


class TorchFlowDenoiser:
    """Velocity-prediction dxdt: the MMDiT output IS dx/dsigma; the model
    timestep is sigma * n_step_train (no table lookup, no c_in)."""

    def __init__(self, params, P, cond, pooled, uncond, npooled, cfg_scale,
                 guidance=None):
        self.params = params
        self.P = P
        self.cond = cond
        self.pooled = pooled
        self.uncond = uncond
        self.npooled = npooled
        self.cfg_scale = cfg_scale
        self.guidance = guidance   # flux-dev embedded guidance (scalar)

    def _model(self, x, tt, cond, pooled):
        if getattr(self.P, "flux", False):
            from torch_ref import torch_flux
            return torch_flux(self.params, x, tt, cond, pooled, self.P,
                              guidance=self.guidance)
        from torch_ref import torch_mmdit
        return torch_mmdit(self.params, x, tt, cond, pooled, self.P)

    def dxdt(self, x, sigma):
        tt = torch.full((x.shape[0],), sigma * self.P.n_step_train,
                        dtype=torch.float32)
        v = self._model(x, tt, self.cond, self.pooled)
        f = self.cfg_scale
        if f > 1:
            vu = self._model(x, tt, self.uncond, self.npooled)
            v = v * f + vu * (1.0 - f)
        return v


def torch_sample_flow(params, P, x0, cond, pooled, uncond=None, npooled=None,
                      *, rng, n_step, method="euler", sched="uniform",
                      cfg_scale=7.0, f_t_ini=1.0, f_t_end=0.0,
                      guidance=None):
    """Rectified-flow trajectory: x_t = (1-sigma) x0 + sigma n, solver steps
    on the flow sigma grid.  Reuses TorchSolver — the solvers are
    sigma-generic, and for dpmpp2m the a*x + (1-a)*x0hat update is the
    analytic flow step."""
    log_sigmas = make_log_sigmas_flow(P.flow_shift, P.n_step_train)
    n_fe = {"euler": 1, "heun": 2, "taylor3": 1, "dpmpp2m": 1,
            "dpmpp2s": 2, "unipc": 1}[method]
    sigmas = make_sigmas(log_sigmas, n_step, sched, n_fe, f_t_ini, f_t_end,
                         P.n_step_train)
    n_step = len(sigmas) - 1
    den = TorchFlowDenoiser(params, P, cond, pooled, uncond, npooled,
                            cfg_scale, guidance=guidance)
    sol = TorchSolver(method, den.dxdt)
    sol.t = float(sigmas[0])
    x = torch.from_numpy(np.asarray(x0, np.float32)).clone()
    traj = []
    for s in range(n_step):
        if s == 0:
            n = rng.randn_shaped(tuple(x.shape)).astype(np.float32)
            x = x * (1.0 - float(sigmas[0])) \
                + torch.from_numpy(n) * float(sigmas[0])
        with torch.no_grad():
            x = sol.step(float(sigmas[s + 1]), x)
        traj.append(x.numpy().copy())
    return traj, sigmas
