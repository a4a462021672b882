"""SDXL-refiner model family (beyond-reference): single OpenCLIP tower
under conditioner.embedders.0.model.*, aesthetic-score labels, no level-0
attention."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth, TUF_LATENT
from helpers import (TINY_MODEL_TYPE_REFINER, patch_tiny_model_types,
                     write_checkpoint_refiner)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "refiner.safetensors"
    write_checkpoint_refiner(path)
    return str(path)


def make(ckpt, monkeypatch):
    patch_tiny_model_types(monkeypatch,
                           {"sdxl_refiner": TINY_MODEL_TYPE_REFINER})
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", "sdxl-refiner")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 7)
    s.option_set("cfg-scale", 5)
    return s


def test_refiner_generate(ckpt, monkeypatch):
    s = make(ckpt, monkeypatch)
    s.option_set("prompt", "a refined test")
    s.option_set("nprompt", "blurry")
    img = s.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()
    # single tower: cond width is the tower's d_embed, not a concat
    assert s.tensors["cond"].shape == (1, 77, 32)
    lab, nlab = s.tensors["label"], s.tensors["nlabel"]
    assert lab.shape == (1, 32 + 5 * 256)
    # aesthetic score differs between cond (6.0) and uncond (2.5) rows:
    # the last 256-block (the score embedding) must differ
    assert not np.allclose(lab[0, -256:], nlab[0, -256:])
    # the size blocks (orig h/w, crop) are identical across rows
    np.testing.assert_allclose(lab[0, 32:32 + 1024],
                               nlab[0, 32:32 + 1024], atol=1e-5)


def test_refiner_label_content(ckpt, monkeypatch):
    from mlimgsynth_tpu.models.unet import AESTHETIC_SCORE
    s = make(ckpt, monkeypatch)
    s.option_set("prompt", "q")
    s.setup()
    cond, label = s._text_cond_encode_rows([s.prompt])
    se = label[0, 32:]
    h = w = 64.0
    np.testing.assert_allclose(se[0], np.cos(h * 1.0), atol=1e-5)
    np.testing.assert_allclose(se[256], np.cos(w * 1.0), atol=1e-5)
    np.testing.assert_allclose(se[512], np.cos(0.0), atol=1e-5)
    np.testing.assert_allclose(se[1024], np.cos(AESTHETIC_SCORE * 1.0),
                               atol=1e-5)


def test_refiner_fused_matches_stepwise(ckpt, monkeypatch):
    """The fused single-tower-label encode (in-loop bigG + feature head +
    aesthetic rows) must match the stepwise host-encode path."""
    def mk():
        s = make(ckpt, monkeypatch)
        s.option_set("prompt", "a (refined:1.2) test")
        s.option_set("nprompt", "noisy")
        return s

    fused = mk().generate()
    s2 = mk()
    s2.option_set("callback", lambda ses, prg: 0)  # forces stepwise path
    stepwise = s2.generate()
    np.testing.assert_allclose(fused, stepwise, atol=2e-5)


def test_refiner_img2img(ckpt, monkeypatch):
    """The refiner's real-world shape: img2img refinement of a latent."""
    s = make(ckpt, monkeypatch)
    rng = np.random.default_rng(3)
    s.tensors["latent"] = rng.standard_normal((1, 4, 8, 8)).astype(
        np.float32)
    s.option_set("tensor-use-flags", TUF_LATENT)
    s.option_set("f-t-ini", 0.3)
    s.option_set("prompt", "refine me")
    img = s.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()
    assert "Mode: img2img" in s.infotext


def test_refiner_identify():
    """A 1280-wide cross-attn K identifies as sdxl_refiner (real-model
    widths; the tiny fixtures use explicit model-type instead)."""
    from mlimgsynth_tpu.weights import identify_model

    class _E:
        shape = (1536, 1280)   # torch [out, in]: in = n_ctx 1280
        dtype = "f16"

    class _S:
        tensors = {"raw": _E()}

    class _R:
        raw = "raw"

    nm = {"unet.in.4.1.transf.0.attn2.k_proj.weight": _R()}
    mt, wt = identify_model(_S(), nm)
    assert mt == "sdxl_refiner"
    assert wt == "f16"


def test_refiner_generate_batch_matches_singles(ckpt, monkeypatch):
    """generate_batch on a refiner-type model (single-tower fused encode
    with per-row aesthetic scores) must reproduce per-request generate()."""
    def mk():
        return make(ckpt, monkeypatch)

    s = mk()
    reqs = [{"prompt": "a cat", "seed": 3},
            {"prompt": "a (dog:1.3)", "nprompt": "blurry", "seed": 4}]
    imgs, infos = s.generate_batch(reqs)
    assert imgs.shape == (2, 3, 64, 64) and np.isfinite(imgs).all()

    for i, r in enumerate(reqs):
        si = mk()
        si.option_set("prompt", r["prompt"])
        if r.get("nprompt"):
            si.option_set("nprompt", r["nprompt"])
        si.option_set("seed", r["seed"])
        single = si.generate()
        np.testing.assert_allclose(imgs[i:i + 1], single, atol=1.5 / 255)
