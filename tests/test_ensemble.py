"""Base->refiner ensemble-of-experts pipeline (beyond-reference;
diffusers denoising_end/denoising_start semantics): the base model stops
at sigma(cut) with that much noise remaining (keep_tail), the refiner
model continues from the exact same sigma without re-adding noise."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth, MlisError
from mlimgsynth_tpu.rng import RngPhilox
from mlimgsynth_tpu.sampling.sampler import SamplerConfig, make_plan
from helpers import (TINY_MODEL_TYPE, TINY_MODEL_TYPE_REFINER,
                     patch_tiny_model_types, write_checkpoint_refiner,
                     write_tiny_checkpoint)


# ---------------------------------------------------------------------------
# plan-level: sigma continuity at the handoff
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sched", ["uniform", "karras"])
def test_handoff_sigma_continuity(sched):
    """Stage 1 (keep_tail, f_t_end=cut) must END at the exact sigma stage 2
    (f_t_ini=cut) STARTS at, for both schedule types."""
    cut = 0.2
    shape = (1, 4, 8, 8)
    p1 = make_plan(SamplerConfig(n_step=20, sched=sched, f_t_end=cut,
                                 keep_tail=True),
                   shape, RngPhilox(1))
    p2 = make_plan(SamplerConfig(n_step=20, sched=sched, f_t_ini=cut,
                                 noise_add=False),
                   shape, RngPhilox(1))
    assert p1.sigmas[-1] > 0          # noise remains at the handoff
    np.testing.assert_allclose(p1.sigmas[p1.n_step], p2.sigmas[0],
                               rtol=1e-5)
    assert p2.sigmas[p2.n_step] == 0  # stage 2 finishes the denoise


def test_keep_tail_drops_one_step():
    base = make_plan(SamplerConfig(n_step=20, f_t_end=0.2), (1, 4, 8, 8),
                     RngPhilox(1))
    kept = make_plan(SamplerConfig(n_step=20, f_t_end=0.2, keep_tail=True),
                     (1, 4, 8, 8), RngPhilox(1))
    assert kept.n_step == base.n_step - 1
    np.testing.assert_array_equal(kept.sigmas, base.sigmas[:-1])


def test_noise_add_off_zeroes_init_draw_only():
    """noise_add=False zeroes noise0 but leaves the stream position (and
    so any per-step draws) identical to the equivalent img2img plan."""
    rng_a, rng_b = RngPhilox(9), RngPhilox(9)
    cfg = dict(n_step=8, f_t_ini=0.3, s_ancestral=1.0, method="euler")
    pa = make_plan(SamplerConfig(**cfg), (1, 4, 8, 8), rng_a)
    pb = make_plan(SamplerConfig(**cfg, noise_add=False), (1, 4, 8, 8),
                   rng_b)
    assert np.abs(pa.noise0).max() > 0
    assert np.abs(pb.noise0).max() == 0
    assert rng_a.offset == rng_b.offset
    np.testing.assert_array_equal(pa.anc_noise, pb.anc_noise)


# ---------------------------------------------------------------------------
# end-to-end through the session API
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    base = d / "base.safetensors"
    ref = d / "refiner.safetensors"
    write_tiny_checkpoint(base)
    write_checkpoint_refiner(ref)
    return str(base), str(ref)


def make_ensemble(ckpts, monkeypatch, switch=0.6):
    base_path, ref_path = ckpts
    patch_tiny_model_types(monkeypatch,
                           {"sd1": TINY_MODEL_TYPE,
                            "sdxl_refiner": TINY_MODEL_TYPE_REFINER})
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", base_path)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 6)
    s.option_set("seed", 21)
    s.option_set("cfg-scale", 4)
    s.option_set("refiner", ref_path)
    s.option_set("refiner-switch", switch)
    # the tiny refiner checkpoint cannot be width-identified, so pre-seed
    # the sub-session with an explicit model type (real checkpoints
    # auto-identify through the 1280-wide cross-attn probe)
    rs = MLImgSynth()
    rs._dtype = jnp.float32
    rs.option_set("model", ref_path)
    rs.option_set("model-type", "sdxl-refiner")
    s._refiner, s._refiner_path = rs, ref_path
    return s


def test_ensemble_generate(ckpts, monkeypatch):
    s = make_ensemble(ckpts, monkeypatch)
    s.option_set("prompt", "an expert ensemble")
    s.option_set("nprompt", "blurry")
    img = s.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()
    assert "Refiner: refiner.safetensors" in s.infotext
    assert "Refiner switch: 0.6" in s.infotext
    assert "an expert ensemble" in s.infotext
    # the handoff latent landed in the base session too
    assert s.tensors["latent"] is not None
    # one-shot state restored on the base session
    assert s.c["f_t_end"] == 0.0 and s.c["no_decode"] is False


def test_ensemble_reproducible(ckpts, monkeypatch):
    s = make_ensemble(ckpts, monkeypatch)
    s.option_set("prompt", "determinism")
    a = s.generate()
    s.option_set("seed", 21)
    s.option_set("prompt", "determinism")
    b = s.generate()
    np.testing.assert_array_equal(a, b)


def test_ensemble_switch_changes_output(ckpts, monkeypatch):
    s = make_ensemble(ckpts, monkeypatch, switch=0.6)
    s.option_set("prompt", "x")
    a = s.generate()
    s.option_set("seed", 21)
    s.option_set("refiner-switch", 0.3)
    s.option_set("prompt", "x")
    b = s.generate()
    assert np.abs(a - b).max() > 1e-4


def test_ensemble_low_strength_refiner_only(ckpts, monkeypatch):
    """img2img below the switch point: the whole denoise belongs to the
    refiner (classic refine-an-image use), with the normal noise add."""
    s = make_ensemble(ckpts, monkeypatch, switch=0.6)  # cut = 0.4
    rng = np.random.default_rng(5)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    s.option_set("image", img)
    s.option_set("f-t-ini", 0.3)     # below the 0.4 cut
    s.option_set("prompt", "refine only")
    out = s.generate()
    assert out.shape == (1, 3, 64, 64) and np.isfinite(out).all()
    assert "Refiner: refiner.safetensors" in s.infotext
    assert "Mode: img2img" in s.infotext


def test_ensemble_batch_matches_singles(ckpts, monkeypatch):
    """The batched serving path runs the ensemble too (latent-only base
    batch -> refiner batch) and must reproduce per-request generate()
    for non-ancestral methods (the stages draw no noise after init)."""
    s = make_ensemble(ckpts, monkeypatch)
    reqs = [{"prompt": "a cat", "seed": 3},
            {"prompt": "a dog", "nprompt": "blurry", "seed": 4}]
    imgs, infos = s.generate_batch(reqs)
    assert imgs.shape == (2, 3, 64, 64) and np.isfinite(imgs).all()
    assert all("Refiner: refiner.safetensors" in t for t in infos)
    # stage-1 infotext params: the BASE model is named, not the refiner
    assert all("Model: base" in t for t in infos)

    for i, r in enumerate(reqs):
        si = make_ensemble(ckpts, monkeypatch)
        si.option_set("prompt", r["prompt"])
        if r.get("nprompt"):
            si.option_set("nprompt", r["nprompt"])
        si.option_set("seed", r["seed"])
        single = si.generate()
        np.testing.assert_allclose(imgs[i:i + 1], single, atol=1.5 / 255)


def test_ensemble_batch_cancellation(ckpts, monkeypatch):
    """Cancelling during the base stage aborts the whole ensemble batch."""
    from mlimgsynth_tpu.api import Aborted
    s = make_ensemble(ckpts, monkeypatch)
    with pytest.raises(Aborted):
        s.generate_batch([{"prompt": "a", "seed": 1}],
                         step_callback=lambda i, n: True)
