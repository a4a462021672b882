"""Two-stage highres-fix (beyond-reference; A1111-style base pass +
latent upscale + img2img refine pass)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth, TUF_LATENT
from helpers import patch_tiny_model_types, write_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_hires.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def make(ckpt):
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 3)
    s.option_set("seed", 11)
    return s


def test_hires_generate(ckpt, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    s = make(ckpt)
    s.option_set_str("hires-fix", "2")
    s.option_set_str("hires-steps", "2")
    s.option_set("prompt", "a hires test")
    img = s.generate()
    assert img.shape == (1, 3, 128, 128)
    assert np.isfinite(img).all()
    assert "Hires upscale: 2" in s.infotext
    assert "Denoising strength: 0.7" in s.infotext
    # base-pass options restored (hires options are persistent)
    assert s.c["width"] == 64 and s.c["steps"] == 3
    assert s.c["hires_fix"] == 2.0
    # the final latent slot holds the refined high-res latent
    assert s.tensors["latent"].shape[-1] == 16


def test_hires_matches_manual_two_stage(ckpt, monkeypatch):
    """hires-fix must be exactly (bit-identical) the base pass + bilinear
    latent upscale + img2img refine composed by hand on one session (the
    session Philox stream continues across stages in both paths)."""
    patch_tiny_model_types(monkeypatch)
    sa = make(ckpt)
    sa.option_set_str("hires-fix", "2")
    sa.option_set_str("hires-steps", "2")
    sa.option_set_str("hires-denoise", "0.6")
    sa.option_set("prompt", "hires equivalence")
    auto = sa.generate()

    sb = make(ckpt)
    sb.option_set("no-decode", 1)
    sb.option_set("prompt", "hires equivalence")
    lat = np.asarray(sb.generate(), np.float32)
    import jax
    lat2 = np.asarray(jax.image.resize(
        jnp.asarray(lat), (1, lat.shape[1], 16, 16), "bilinear"),
        np.float32)
    sb.option_set("no-decode", 0)
    sb.option_set("image-dim", 128)
    sb.option_set("steps", 2)
    sb.option_set("f-t-ini", 0.6)
    sb.tensors["latent"] = lat2
    sb.option_set("tensor-use-flags", TUF_LATENT)
    sb.option_set("prompt", "hires equivalence")
    manual = sb.generate()
    np.testing.assert_array_equal(auto, manual)


def test_hires_generate_batch(ckpt, monkeypatch):
    """Batched serving path: hires runs base batch -> latent upscale ->
    refine batch; per-request results are batch-size invariant."""
    patch_tiny_model_types(monkeypatch)
    s = make(ckpt)
    s.option_set_str("hires-fix", "2")
    s.option_set_str("hires-steps", "2")
    reqs = [{"prompt": "hires batch a", "seed": 7},
            {"prompt": "hires batch b", "seed": 8}]
    imgs, infos = s.generate_batch(reqs)
    assert imgs.shape == (2, 3, 128, 128)
    assert np.isfinite(imgs).all()
    assert all("Hires upscale: 2" in t for t in infos)
    # options restored for the next batch
    assert s.c["width"] == 64 and s.c["steps"] == 3

    solo, _ = s.generate_batch([reqs[1]])
    np.testing.assert_array_equal(imgs[1], solo[0])


def test_hires_a1111_translation():
    from mlimgsynth_tpu.server import _a1111_to_req
    out = _a1111_to_req({"prompt": "p", "enable_hr": True, "hr_scale": 1.5,
                         "hr_second_pass_steps": 4,
                         "denoising_strength": 0.55,
                         "sampler_name": "Euler"})
    assert out["hires_fix"] == 1.5
    assert out["hires_steps"] == 4
    assert out["hires_denoise"] == 0.55
    # img2img keeps denoising_strength as f_t_ini, no hires keys
    out2 = _a1111_to_req({"prompt": "p", "init_images": ["aGk="],
                          "denoising_strength": 0.4,
                          "sampler_name": "Euler"}, img2img=True)
    assert out2["f_t_ini"] == 0.4
    assert "hires_fix" not in out2


def test_hires_option_plumbing(ckpt):
    s = MLImgSynth()
    s.option_set_str("hires-fix", "1.5")
    s.option_set_str("hires-denoise", "0.55")
    s.option_set_str("hires-steps", "7")
    assert s.option_get("hires-fix") == 1.5
    assert s.option_get("hires-denoise") == 0.55
    assert s.option_get("hires-steps") == 7
