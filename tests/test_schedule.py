import numpy as np
import pytest

from mlimgsynth_tpu.sampling import schedule as sch


def test_sigma_min_max():
    # The UNet param tables pin these (reference: src/unet.c:36-38)
    ls = sch.get_log_sigmas()
    assert np.exp(ls[0]) == pytest.approx(0.029167158, rel=1e-5)
    assert np.exp(ls[-1]) == pytest.approx(14.614641, rel=1e-5)
    assert len(ls) == 1000
    assert np.all(np.diff(ls) > 0)


def test_t_sigma_roundtrip():
    for t in (0.0, 1.0, 123.456, 500.0, 998.9, 999.0):
        s = sch.t_to_sigma(np.float32(t))
        t2 = sch.sigma_to_t(s)
        assert float(t2) == pytest.approx(t, abs=1e-2)


def test_uniform_schedule_endpoints():
    s = sch.make_schedule(20)
    assert s.n_step == 20
    assert len(s.sigmas) == 21
    assert s.sigmas[-1] == 0.0
    # first sigma is sigma_max (t = 999)
    assert s.sigmas[0] == pytest.approx(14.614641, rel=1e-5)
    assert s.sigmas[19] == pytest.approx(0.029167158, rel=1e-4)
    assert np.all(np.diff(s.sigmas) < 0)


def test_karras_schedule():
    s = sch.make_schedule(20, sched=sch.SCHED_KARRAS)
    assert s.sigmas[0] == pytest.approx(14.614641, rel=1e-5)
    assert s.sigmas[19] == pytest.approx(0.029167158, rel=1e-4)
    assert np.all(np.diff(s.sigmas) < 0)
    # Karras rho-7 midpoint: sigma_i = (smaxp + i*f)^7
    p = 7.0
    smaxp = 14.614641 ** (1 / p)
    sminp = 0.029167158 ** (1 / p)
    f = (sminp - smaxp) / 19
    assert s.sigmas[10] == pytest.approx((smaxp + 10 * f) ** p, rel=1e-4)


def test_nfe_budget_division():
    # 2nd-order solvers halve the step count (src/sampling.c:47-52)
    s = sch.make_schedule(20, solver_n_fe=2)
    assert s.n_step == 10
    assert s.nfe_per_step == 2
    s = sch.make_schedule(21, solver_n_fe=2, nfe_per_dxdt=2)
    assert s.n_step == 11
    assert s.nfe_per_step == 4


def test_img2img_step_reduction():
    s = sch.make_schedule(20, f_t_ini=0.7)
    assert s.n_step == 14
    assert s.sigmas[0] == pytest.approx(
        float(sch.t_to_sigma(np.float32(999 * 0.7))), rel=1e-5)


def test_step_noise_plain():
    s = sch.make_schedule(10)
    plan = sch.plan_step_noise(s.sigmas)
    np.testing.assert_array_equal(plan.s_hat, s.sigmas[:10])
    np.testing.assert_array_equal(plan.s_down, s.sigmas[1:])
    assert np.all(plan.churn_sigma == 0)
    assert np.all(plan.s_up == 0)


def test_step_noise_ancestral():
    s = sch.make_schedule(10)
    plan = sch.plan_step_noise(s.sigmas, s_ancestral=1.0)
    # ancestral: s_down^2 + s_up^2 == sigma_next^2
    for i in range(9):
        assert plan.s_down[i] ** 2 + plan.s_up[i] ** 2 == pytest.approx(
            float(s.sigmas[i + 1]) ** 2, rel=1e-4)
        assert plan.s_up[i] > 0
    # no noise after the last step
    assert plan.s_up[9] == 0


def test_step_noise_sde():
    import math
    s = sch.make_schedule(10)
    eta = 0.8
    plan = sch.plan_step_noise(s.sigmas, sde_eta=eta)
    for i in range(9):
        s1, s2 = float(s.sigmas[i]), float(s.sigmas[i + 1])
        # k-diffusion sample_dpmpp_2m_sde split in exp/expm1 form
        h = math.log(s1) - math.log(s2)
        assert plan.s_down[i] == pytest.approx(s2 * math.exp(-eta * h),
                                               rel=1e-5)
        assert plan.s_up[i] == pytest.approx(
            s2 * math.sqrt(-math.expm1(-2 * eta * h)), rel=1e-5)
        # variance restored: s_down^2 + s_up^2 == sigma_next^2
        assert plan.s_down[i] ** 2 + plan.s_up[i] ** 2 == pytest.approx(
            s2 * s2, rel=1e-4)
        assert plan.t_next[i] == pytest.approx(s2, rel=1e-6)
        assert plan.churn_sigma[i] == 0
    assert plan.s_up[9] == 0
    # s_noise multiplies the SDE noise (not churn)
    plan2 = sch.plan_step_noise(s.sigmas, s_noise=1.5, sde_eta=eta)
    np.testing.assert_allclose(plan2.s_up[:9], plan.s_up[:9] * 1.5,
                               rtol=1e-6)
    assert np.all(plan2.churn_sigma == 0)


def test_step_noise_churn():
    s = sch.make_schedule(10)
    plan = sch.plan_step_noise(s.sigmas, s_noise=1.0)
    assert plan.churn_sigma[0] == 0  # no churn on step 0
    for i in range(1, 10):
        sc = float(s.sigmas[i])
        assert plan.s_hat[i] == pytest.approx(sc * np.sqrt(2), rel=1e-5)
        assert plan.churn_sigma[i] == pytest.approx(sc, rel=1e-4)
