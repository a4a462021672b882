"""Latent-consistency sampling (beyond-reference): the lcm method +
distillation timestep grid.  The trajectory itself is oracle-tested in
test_trajectory_oracle; here: grid construction and the session surface."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth
from mlimgsynth_tpu.sampling import schedule as sch
from mlimgsynth_tpu.sampling.sampler import SamplerConfig, make_plan
from mlimgsynth_tpu.rng import RngPhilox
from helpers import patch_tiny_model_types, write_tiny_checkpoint


def test_lcm_grid_timesteps():
    """k=4 from the 50-step origin grid: floor(i*50/4) -> indices
    [0,12,25,37] -> timesteps [999, 759, 499, 259]."""
    s = sch.make_schedule(4, "lcm")
    ls = sch.get_log_sigmas()
    want = sch.t_to_sigma(np.asarray([999, 759, 499, 259], np.float32), ls)
    np.testing.assert_allclose(s.sigmas[:4], want, rtol=1e-6)
    assert s.sigmas[4] == 0.0
    assert np.all(np.diff(s.sigmas) < 0)


def test_lcm_grid_clamps_to_origin():
    s = sch.make_schedule(60, "lcm")
    assert s.n_step == 50      # cannot exceed the origin grid


def test_lcm_grid_strength_truncation():
    """img2img strength 0.6: the grid's high-noise end is cut at
    origin_eff = 30 -> top timestep 30*20-1 = 599 (and the generic
    step-count scaling still applies: 10 * 0.6 = 6 steps)."""
    s = sch.make_schedule(10, "lcm", f_t_ini=0.6)
    ls = sch.get_log_sigmas()
    assert s.n_step == 6
    np.testing.assert_allclose(
        s.sigmas[0], float(sch.t_to_sigma(np.float32(599), ls)), rtol=1e-6)


def test_lcm_method_implies_grid():
    """method=lcm with the default uniform schedule auto-upgrades to the
    lcm grid; an explicit karras choice is honored."""
    pa = make_plan(SamplerConfig(method="lcm", n_step=4, cfg_scale=1.0),
                   (1, 4, 8, 8), RngPhilox(1))
    pb = make_plan(SamplerConfig(method="lcm", sched="lcm", n_step=4,
                                 cfg_scale=1.0), (1, 4, 8, 8), RngPhilox(1))
    np.testing.assert_array_equal(pa.sigmas, pb.sigmas)
    pk = make_plan(SamplerConfig(method="lcm", sched="karras", n_step=4,
                                 cfg_scale=1.0), (1, 4, 8, 8), RngPhilox(1))
    assert not np.array_equal(pa.sigmas, pk.sigmas)


def test_lcm_plan_tables():
    """The lcm noise plan: no churn, full re-noise to the next sigma on
    every step except the last, solver slot zeroed."""
    p = make_plan(SamplerConfig(method="lcm", n_step=4, cfg_scale=1.0),
                  (1, 4, 8, 8), RngPhilox(3))
    assert np.all(p.churn_sigma == 0) and np.all(p.s_down == 0)
    np.testing.assert_array_equal(p.s_up, p.sigmas[1:])
    np.testing.assert_array_equal(p.t_next, p.sigmas[1:])
    # a draw exists for every step except the last
    assert np.abs(p.anc_noise[:-1]).max() > 0
    assert np.abs(p.anc_noise[-1]).max() == 0


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def test_lcm_generate(ckpt, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 4)
    s.option_set("seed", 9)
    s.option_set("cfg-scale", 1.0)       # distilled-model shape
    s.option_set("method", "lcm")
    s.option_set("prompt", "a consistency test")
    img = s.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()
    assert "Sampler: lcm" in s.infotext

    # deterministic across the fused and stepwise paths
    s.option_set("seed", 9)
    s.option_set("method", "lcm")
    s.option_set("prompt", "a consistency test")
    s.option_set("callback", lambda ses, prg: 0)   # stepwise path
    img2 = s.generate()
    np.testing.assert_allclose(img, img2, atol=2e-5)
