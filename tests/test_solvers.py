import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.sampling.solvers import SOLVERS, get_solver

jax.config.update("jax_enable_x64", False)


def run_solver(cls, sigmas, x0, dxdt):
    """Drive a solver through the sigma sequence like the sampler does."""
    x = jnp.asarray(x0)
    state = cls.init_state(x)
    t = jnp.float32(sigmas[0])
    for i in range(len(sigmas) - 1):
        x, state = cls.step(dxdt, x, state, jnp.int32(i), t,
                            jnp.float32(sigmas[i + 1]))
        t = jnp.float32(sigmas[i + 1])
    return np.asarray(x)


def test_exact_on_linear_flow():
    # If the denoiser always predicts 0, dx/dsigma = x/sigma and the exact
    # solution is x(sigma) = x0 * sigma/sigma0 — every solver must track it.
    def dxdt(x, sigma):
        return x / sigma

    sigmas = np.array([14.0, 8.0, 4.0, 2.0, 1.0, 0.5], dtype=np.float32)
    x0 = np.array([14.0, -28.0], dtype=np.float32)
    for name, cls in SOLVERS.items():
        out = run_solver(cls, sigmas, x0, dxdt)
        expected = x0 * sigmas[-1] / sigmas[0]
        np.testing.assert_allclose(out, expected, rtol=2e-3, err_msg=name)


def test_convergence_order():
    # dx/dt = -x integrated from t=1 to t=0.1 (sigma as plain time variable):
    # halving step size should shrink error per order.
    def dxdt(x, t):
        return -x

    def err(name, n):
        sig = np.linspace(1.0, 0.1, n + 1, dtype=np.float32)
        out = run_solver(SOLVERS[name], sig, np.array([1.0], np.float32), dxdt)
        exact = np.exp(-(0.1 - 1.0)) * np.exp(-0.0)  # x(t)=x0*exp(-(t-t0))
        exact = np.exp(0.9)
        return abs(float(out[0]) - exact)

    # euler ~O(h), heun ~O(h^2)
    assert err("euler", 40) < err("euler", 10)
    assert err("heun", 40) < err("heun", 10)
    assert err("heun", 20) < err("euler", 20)
    assert err("taylor3", 20) < err("euler", 20)


def test_last_step_zero_sigma():
    # t_next == 0 on the final step: solvers must not divide by zero.
    def dxdt(x, sigma):
        return x / jnp.maximum(sigma, 1e-8)

    sigmas = np.array([2.0, 1.0, 0.0], dtype=np.float32)
    for name, cls in SOLVERS.items():
        out = run_solver(cls, sigmas, np.array([2.0], np.float32), dxdt)
        assert np.isfinite(out).all(), name
        np.testing.assert_allclose(out, [0.0], atol=1e-5, err_msg=name)


def test_method_id_mapping():
    assert get_solver(1).name == "euler"
    assert get_solver(4).name == "dpmpp2m"
    assert get_solver("heun").n_fe == 2
    with pytest.raises(ValueError):
        get_solver("nope")


def test_dpmpp2m_matches_reference_formula():
    # one hand-computed 2-step trajectory of the reference DPM++(2M) update
    # (src/solvers.c:207-231)
    def dxdt(x, sigma):
        return 0.5 * x / sigma

    sigmas = [4.0, 2.0, 1.0]
    x = 8.0
    # step 0: c=0 -> d = d0 = x - sigma*dx = 8 - 4*1 = 4; a=0.5
    # x1 = 0.5*8 + 0.5*4 = 6; h0 = -ln(0.5)
    # step 1: a=0.5, h1=-ln(0.5), c = h1/(2*h0) = 0.5
    # dx = 0.5*6/2 = 1.5; d0 = 6 - 2*1.5 = 3; d = 1.5*3 - 0.5*4 = 2.5
    # x2 = 0.5*6 + 0.5*2.5 = 4.25
    out = run_solver(SOLVERS["dpmpp2m"], np.array(sigmas, np.float32),
                     np.array([x], np.float32), dxdt)
    np.testing.assert_allclose(out, [4.25], rtol=1e-6)


def test_heun_matches_reference_formula():
    # hand-computed Heun step (src/solvers.c:100-119):
    # dxdt(x,s) = x/s; from s=4 to s=2: d0 = 8/4 = 2; x1 = 8 + 2*(-2) = 4
    # d1 = 4/2 = 2; x = 8 + (2+2)*0.5*(-2) = 4
    def dxdt(x, s):
        return x / s

    out = run_solver(SOLVERS["heun"], np.array([4.0, 2.0], np.float32),
                     np.array([8.0], np.float32), dxdt)
    np.testing.assert_allclose(out, [4.0], rtol=1e-6)


def test_taylor3_matches_reference_formula():
    # two steps of the reference Taylor3 (src/solvers.c:137-165) with
    # dxdt(x,s) = s (independent of x): exact integral.
    # step0 (4->2): dt=-2, dx=4, x=8-8=0; i_step=0 so no corrections;
    #   dp1=4, dp2=(4-garbage)*0=0, dt_prev=-2
    # step1 (2->1): dt=-1, dx=2, x=0-2=-2; idtp=1/-2=-0.5, f2=dt^2/2=0.5,
    #   d2=(2-4)*(-0.5)=1, d3=(1-0)*(-0.5)=-0.5, f3=0 (i_step<2)
    #   x=-2 + 1*0.5 = -1.5
    def dxdt(x, s):
        return s * jnp.ones_like(x)

    out = run_solver(SOLVERS["taylor3"], np.array([4.0, 2.0, 1.0], np.float32),
                     np.array([8.0], np.float32), dxdt)
    np.testing.assert_allclose(out, [-1.5], rtol=1e-6)


def test_dpmpp2s_matches_reference_formula():
    # one DPM++(2S) step (src/solvers.c:264-290) with dxdt(x,s)=x/(2s):
    # from s=4 to s=1: t1=sqrt(4)=2, dt1=-2, dx=8/8=1, x1=8-2=6
    # dx1 = 6/4 = 1.5, d = 6 - 2*1.5 = 3, a=0.25
    # x = 0.25*8 + 0.75*3 = 4.25
    def dxdt(x, s):
        return x / (2 * s)

    out = run_solver(SOLVERS["dpmpp2s"], np.array([4.0, 1.0], np.float32),
                     np.array([8.0], np.float32), dxdt)
    np.testing.assert_allclose(out, [4.25], rtol=1e-6)
