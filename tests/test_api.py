"""End-to-end session tests with a synthetic tiny checkpoint."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import (MLImgSynth, MlisError, TUF_IMAGE, TUF_MASK)
from helpers import patch_tiny_model_types, write_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


@pytest.fixture
def session(ckpt, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 3)
    s.option_set("seed", 42)
    return s


def test_txt2img(session):
    session.option_set("prompt", "a photo of a cat")
    img = session.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert "Seed: 42" in session.infotext
    assert "Steps: 3" in session.infotext
    assert "a photo of a cat" in session.infotext


def test_reproducible(session):
    session.option_set("prompt", "a dog")
    a = session.generate()
    session.option_set("seed", 42)
    session.option_set("prompt", "a dog")
    b = session.generate()
    np.testing.assert_array_equal(a, b)


def test_img2img(session):
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    session.option_set("image", img)
    session.option_set("f-t-ini", 0.6)
    session.option_set("prompt", "more cats")
    out = session.generate()
    assert out.shape == (1, 3, 64, 64)
    assert "Mode: img2img" in session.infotext
    # one-shot options cleared
    assert session.c["f_t_ini"] == 1.0
    assert session.c["tuflags"] == 0


def test_inpaint_alpha(session):
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 4)) * 255).astype(np.uint8)
    img[:, :, 3] = 0          # transparent = repainted (reference README)
    img[:32, :, 3] = 255      # opaque top half is KEPT
    session.option_set("image", img)
    session.option_set("f-t-ini", 0.8)
    session.option_set("prompt", "x")
    out = session.generate()
    assert out.shape == (1, 3, 64, 64)
    assert "Mode: inpaint" in session.infotext


def test_progress_callback(session):
    events = []

    def cb(s, prog):
        events.append((prog["stage"], prog["step"], prog["step_end"]))
        return 0

    session.option_set("callback", cb)
    session.option_set("prompt", "z")
    session.generate()
    stages = [e[0] for e in events]
    from mlimgsynth_tpu.api import (STAGE_COND_ENCODE, STAGE_DENOISE,
                                    STAGE_IMAGE_DECODE)
    assert STAGE_COND_ENCODE in stages
    assert STAGE_IMAGE_DECODE in stages
    assert stages.count(STAGE_DENOISE) == 3  # one per step


def test_callback_abort(session):
    def cb(s, prog):
        from mlimgsynth_tpu.api import STAGE_DENOISE
        return 1 if prog["stage"] == STAGE_DENOISE and prog["step"] >= 2 \
            else 0

    session.option_set("callback", cb)
    session.option_set("prompt", "z")
    session.generate()  # aborts the loop but still decodes


def test_no_decode_latent(session):
    session.option_set("no-decode", True)
    session.option_set("prompt", "z")
    lat = session.generate()
    assert lat.shape == (1, 4, 8, 8)
    session.option_set("no-decode", False)


def test_batch(session):
    session.option_set("batch-size", 2)
    session.option_set("prompt", "two cats")
    out = session.generate()
    assert out.shape == (2, 3, 64, 64)
    # different noise per batch entry
    assert not np.allclose(out[0], out[1])


def test_methods_and_scheduler_options(session):
    session.option_set("method", "dpm++2m")  # '+' tolerated
    assert session.c["method"] == "dpmpp2m"
    session.option_set("method", "euler_a")  # ancestral alias
    assert session.c["method"] == "euler"
    assert session.c["s_ancestral"] == 1.0
    session.option_set_str("scheduler", "Karras")
    assert session.c["scheduler"] == "karras"
    with pytest.raises(MlisError):
        session.option_set("method", "nope")
    with pytest.raises(MlisError):
        session.option_set_str("nonsense-option", "1")


def test_option_str_parsing(session):
    session.option_set_str("image-dim", "48,32")
    assert session.c["width"] == 48 and session.c["height"] == 32
    session.option_set_str("cfg-scale", "11.5")
    assert session.c["cfg_scale"] == 11.5
    session.option_set_str("CFG_SCALE", "7")  # case-insensitive
    assert session.c["cfg_scale"] == 7.0


def test_clip_encode_similarity(session):
    emb1, _ = session.clip_text_encode("a cat")
    emb2, _ = session.clip_text_encode("a cat")
    assert emb1.shape == (1, 77, 32)
    np.testing.assert_array_equal(emb1, emb2)


def test_tokenize(session):
    toks = session.text_tokenize("a dog jumping")
    assert toks == [320, 1929, 11476]


def test_vae_roundtrip_and_tile(session):
    rng = np.random.default_rng(3)
    img = rng.random((1, 3, 256, 256)).astype(np.float32)
    session.setup()
    lat = session.image_encode(img, sample=False)
    assert lat.shape == (1, 4, 32, 32)
    full = session.image_decode(lat)
    session.option_set("vae-tile", 64)
    tiled = session.image_decode(lat)
    session.option_set("vae-tile", 0)
    assert full.shape == tiled.shape == (1, 3, 256, 256)
    # interior must match exactly where tiles carried enough context;
    # allow boundary effects within the overlap margin
    diff = np.abs(full - tiled)
    assert np.median(diff) < 2e-3


def test_missing_tensor_error(tmp_path, monkeypatch, ckpt):
    from safetensors.numpy import save_file
    patch_tiny_model_types(monkeypatch)
    save_file({"model.diffusion_model.time_embed.0.weight":
               np.zeros((64, 32), np.float32)}, str(tmp_path / "bad.st"))
    s = MLImgSynth()
    s.option_set("model", str(tmp_path / "bad.st"))
    s.option_set("model-type", "sd1")
    s.option_set("prompt", "x")
    with pytest.raises((MlisError, KeyError)):
        s.generate()


def test_seed_variations(tmp_path, monkeypatch):
    """A1111 subseed slerp: strength 0 == base run; strength 1 == the
    subseed's own run (slerp endpoints); in-between differs from both
    and reproduces exactly."""
    from helpers import TINY_MODEL_TYPE, patch_tiny_model_types, \
        write_tiny_checkpoint
    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "sd1.safetensors"
    write_tiny_checkpoint(ckpt)

    def mk():
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("model-type", "sd1")
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        s.option_set("no-decode", 1)
        return s

    def gen(s, seed, sub=None, strength=0.0):
        s.option_set("seed", seed)
        s.option_set("subseed", -1 if sub is None else sub)
        s.option_set("subseed-strength", strength)
        s.option_set("prompt", "a photo")
        return np.asarray(s.generate())

    s = mk()
    base = gen(s, 7)
    subrun = gen(s, 99)
    # endpoint checks
    np.testing.assert_array_equal(gen(s, 7, 99, 0.0), base)
    v1 = gen(s, 7, 99, 1.0)
    np.testing.assert_allclose(v1, subrun, atol=1e-4)
    mid = gen(s, 7, 99, 0.4)
    assert not np.array_equal(mid, base)
    assert not np.array_equal(mid, v1)
    np.testing.assert_array_equal(mid, gen(s, 7, 99, 0.4))
    assert "Variation seed: 99" in s.infotext
    assert "Variation seed strength: 0.4" in s.infotext

    # batched path: per-request subseed, batch-invariant
    s.option_set("subseed-strength", 0.4)
    out, infos = s.generate_batch(
        [{"prompt": "a photo", "seed": 7, "subseed": 99}])
    assert "Variation seed: 99" in infos[0]


def test_inpaint_full_res(tmp_path, monkeypatch):
    """Crop-around-mask inpainting: pixels outside the mask are
    preserved exactly; inside they change; crop utilities behave."""
    from helpers import TINY_MODEL_TYPE, patch_tiny_model_types, \
        write_tiny_checkpoint
    from mlimgsynth_tpu.utils.image import inpaint_crop_region
    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "sd1.safetensors"
    write_tiny_checkpoint(ckpt)

    # geometry: repaint blob -> padded aspect-expanded box (the crop
    # helper takes white = repaint)
    rep = np.zeros((1, 1, 128, 128), np.float32)
    rep[:, :, 40:60, 30:50] = 1.0
    box = inpaint_crop_region(rep, 64, 64, 8, mult=8)
    x0, y0, x1, y1 = box
    assert x0 <= 30 - 8 + 7 and x1 >= 50 + 8 - 7
    assert (x1 - x0) % 8 == 0 and (y1 - y0) % 8 == 0
    assert inpaint_crop_region(np.zeros_like(rep), 64, 64, 8) is None
    # session masks are 1 = KEEP (reference alpha convention)
    m = 1.0 - rep

    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 9)
    img = np.random.RandomState(0).rand(1, 3, 128, 128).astype(np.float32)
    s.tensors["image"] = img
    s.tensors["mask"] = m
    s.option_set("tensor-use-flags", TUF_IMAGE | TUF_MASK)
    s.option_set("inpaint-full-res", 1)
    s.option_set("f-t-ini", 0.6)
    s.option_set("prompt", "a patch")
    out = s.generate()
    assert out.shape == img.shape
    kept = (m[0, 0] == 1)     # keep region: untouched by the paste
    np.testing.assert_array_equal(out[0, :, kept].T, img[0, :, kept].T)
    assert not np.allclose(out[0, :, ~kept], img[0, :, ~kept],
                           atol=1e-3)
    assert "Inpaint area: only masked" in s.infotext


def test_mask_blur_option(tmp_path, monkeypatch):
    """mask_blur softens the latent mask: blurred-mask inpainting blends
    at the seam instead of hard-switching; blur-0 path is unchanged."""
    from helpers import TINY_MODEL_TYPE, patch_tiny_model_types, \
        write_tiny_checkpoint
    from mlimgsynth_tpu.utils.image import mask_gaussian_blur
    m = np.zeros((1, 1, 64, 64), np.float32)
    m[:, :, 16:48, 16:48] = 1.0
    b = mask_gaussian_blur(m, 4.0)
    assert b.max() <= 1.0 and b.min() >= 0.0
    assert 0.05 < b[0, 0, 15, 32] < 0.6      # softened outside edge
    assert b[0, 0, 32, 32] > 0.99

    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "sd1.safetensors"
    write_tiny_checkpoint(ckpt)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 4)
    img = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)

    def gen(blur):
        s.option_set("seed", 4)
        s.tensors["image"] = img
        s.tensors["mask"] = m
        s.option_set("tensor-use-flags", TUF_IMAGE | TUF_MASK)
        s.option_set("mask-blur", blur)
        s.option_set("f-t-ini", 0.6)
        s.option_set("prompt", "x")
        return s.generate()

    hard, soft = gen(0), gen(6.0)
    assert not np.array_equal(hard, soft)
