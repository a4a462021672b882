"""Edge cases: corrupt files, unet-split residency, option combos."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth, MlisError
from helpers import TINY_MODEL_TYPE, patch_tiny_model_types, \
    write_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def make_session(ckpt, monkeypatch, **opts):
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 3)
    for k, v in opts.items():
        s.option_set(k.replace("_", "-"), v)
    return s


def test_truncated_checkpoint(tmp_path, monkeypatch, ckpt):
    data = open(ckpt, "rb").read()
    bad = tmp_path / "trunc.safetensors"
    bad.write_bytes(data[:100])
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s.option_set("model", str(bad))
    with pytest.raises(Exception):
        s.setup()


def test_garbage_file(tmp_path, monkeypatch):
    bad = tmp_path / "junk.safetensors"
    bad.write_bytes(b"this is not a checkpoint at all" * 10)
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s.option_set("model", str(bad))
    with pytest.raises(Exception):
        s.setup()


def test_unet_split_residency(ckpt, monkeypatch):
    s = make_session(ckpt, monkeypatch, unet_split=True)
    s.option_set("prompt", "x")
    img = s.generate()
    assert np.isfinite(img).all()
    # stage-wise residency: unet params were dropped after the loop
    assert "unet" not in s._params
    assert "vae" in s._params


def test_error_handler_called(ckpt, monkeypatch):
    calls = []
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s.option_set("error_handler", lambda ctx, ei: calls.append(ei))
    s.option_set("prompt", "x")  # no model set
    with pytest.raises(MlisError):
        s.generate()
    assert calls and calls[0]["code"] < 0
    assert "model" in calls[0]["desc"].lower()


def test_snoise_and_karras(ckpt, monkeypatch):
    s = make_session(ckpt, monkeypatch, s_noise=1.0, scheduler="karras",
                     steps=3)
    s.option_set("prompt", "x")
    img = s.generate()
    assert np.isfinite(img).all()
    assert "SNoise: 1" in s.infotext
    assert "Schedule type: karras" in s.infotext


def test_batch_img2img(ckpt, monkeypatch):
    s = make_session(ckpt, monkeypatch, batch_size=2, f_t_ini=0.7)
    rng = np.random.default_rng(0)
    s.option_set("image", (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    s.option_set("prompt", "x")
    out = s.generate()
    assert out.shape == (2, 3, 64, 64)
    assert not np.allclose(out[0], out[1])


def test_clip_skip_changes_output(ckpt, monkeypatch):
    s = make_session(ckpt, monkeypatch)
    s.setup()
    a, _ = s.clip_text_encode("a dog")
    s.option_set("clip-skip", 2)
    b, _ = s.clip_text_encode("a dog")
    assert not np.allclose(a, b)


def test_weight_type_q8_session(ckpt, tmp_path, monkeypatch):
    # weight-type option accepts quantized names (compute stays bf16/f32)
    s = make_session(ckpt, monkeypatch)
    s.option_set("weight-type", "q8_0")
    assert s.c["weight_type"] == "q8_0"
    with pytest.raises(MlisError):
        s.option_set("weight-type", "q17_9")


def test_f_t_end_partial_denoise(ckpt, monkeypatch):
    # --f-t-end > 0 stops the schedule early (fewer steps, sigma floor > 0)
    s = make_session(ckpt, monkeypatch, steps=10)
    s.option_set("f-t-end", 0.5)
    s.option_set("prompt", "x")
    s.option_set("no-decode", True)
    lat = s.generate()
    assert np.isfinite(lat).all()
    assert "Steps: 5" in s.infotext  # 10 * (1.0 - 0.5)


def test_dump_flags_write_files(ckpt, monkeypatch, tmp_path):
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        s = make_session(ckpt, monkeypatch, dump_flags=1 | 4)
        s.option_set("prompt", "x")
        s.option_set("no-decode", True)
        s.generate()
    finally:
        os.chdir(cwd)
    dump = (tmp_path / "dump-tensors-model.txt").read_text()
    assert "model.diffusion_model.time_embed.0.weight" in dump
    graph = (tmp_path / "dump-graph.txt").read_text()
    assert "conv_general_dilated" in graph


def test_batch_matches_sequential_seeds(ckpt, monkeypatch):
    """Batch entry i must equal a single run with seed+i (no-decode latents)."""
    outs = []
    for seed in (5, 6):
        s = make_session(ckpt, monkeypatch, no_decode=True)
        s.option_set("seed", seed)
        s.option_set("prompt", "a dog")
        outs.append(s.generate())
    sb = make_session(ckpt, monkeypatch, batch_size=2, no_decode=True)
    sb.option_set("seed", 5)
    sb.option_set("prompt", "a dog")
    batch = sb.generate()
    # XLA tiles batch-1 and batch-2 convs differently -> tiny float drift
    np.testing.assert_allclose(batch[0:1], outs[0], atol=2e-4)
    np.testing.assert_allclose(batch[1:2], outs[1], atol=2e-4)


def test_error_codes_match_header():
    """MlisError codes must equal include/mlimgsynth.h MLIS_ErrCode values
    (they cross the C ABI via capi._wrap)."""
    import os
    import re
    hdr = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "include", "mlimgsynth.h")).read()
    codes = dict(re.findall(r"MLIS_(E_\w+)\s*=\s*(-\d+)", hdr))
    assert len(codes) >= 8
    for name, val in codes.items():
        assert getattr(MlisError, name) == int(val), name


def test_fused_pipeline_matches_stepwise(ckpt, monkeypatch):
    """The single-dispatch fused path (CLIP + loop + decode in one program)
    must produce the same image as the step-at-a-time path with separate
    encode/decode dispatches."""
    patch_tiny_model_types(monkeypatch)

    def make():
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("model-type", "sd1")
        s.option_set("image-dim", 64)
        s.option_set("steps", 3)
        s.option_set("seed", 19)
        s.option_set("prompt", "a (fused:1.3) test")
        return s

    fused = make().generate()           # no callback -> fused path
    s2 = make()
    s2.option_set("callback", lambda ses, prg: 0)  # forces stepwise path
    stepwise = s2.generate()
    np.testing.assert_allclose(fused, stepwise, atol=2e-5)
    # fused path still exposes the conditioning tensors (lazily)
    s3 = make()
    s3.generate()
    assert s3.tensors["cond"] is not None
    assert np.asarray(s3.tensors["cond"]).shape[1] == 77

def test_sdxl_fused_pipeline_matches_stepwise(tmp_path, monkeypatch):
    """SDXL's fused single-dispatch path (clip-L + bigG + feature head +
    size labels + loop + decode in ONE program) must match the stepwise
    path that encodes conditioning on the host."""
    from helpers import TINY_MODEL_TYPE_XL, write_checkpoint_sdxl
    ckpt = tmp_path / "xl3.safetensors"
    write_checkpoint_sdxl(ckpt)
    patch_tiny_model_types(monkeypatch, {"sdxl": TINY_MODEL_TYPE_XL})

    def make():
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("model-type", "sdxl")
        s.option_set("image-dim", 64)
        s.option_set("steps", 3)
        s.option_set("seed", 23)
        s.option_set("cfg-scale", 5)
        s.option_set("prompt", "an (sdxl:1.2) test")
        s.option_set("nprompt", "blurry")
        return s

    fused = make().generate()
    s2 = make()
    s2.option_set("callback", lambda ses, prg: 0)  # forces stepwise path
    stepwise = s2.generate()
    np.testing.assert_allclose(fused, stepwise, atol=2e-5)

    # empty nprompt: uncond_empty_zero rides the weight matrix in-loop and
    # must still match the host path (which zeroes ncond explicitly)
    sa = make()
    sa.option_set("nprompt", "")
    fused0 = sa.generate()
    assert np.all(np.asarray(sa.tensors["ncond"]) == 0)
    sb = make()
    sb.option_set("nprompt", "")
    sb.option_set("callback", lambda ses, prg: 0)
    np.testing.assert_allclose(fused0, sb.generate(), atol=2e-5)

def test_chunked_encode_matches_host_encode(ckpt, monkeypatch):
    """The cancellable (step-callback) path fuses text-encode into the
    first chunk; it must match the host-encode path (forced via
    unet_split, which keeps encode on the host for stage-wise weight
    residency)."""
    patch_tiny_model_types(monkeypatch)

    def make(**opts):
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("model-type", "sd1")
        s.option_set("image-dim", 64)
        s.option_set("steps", 3)
        s.option_set("seed", 31)
        s.option_set("prompt", "a (chunked:1.2) encode test")
        for k, v in opts.items():
            s.option_set(k.replace("_", "-"), v)
        return s

    s1 = make()
    s1.option_set("callback", lambda ses, prg: 0)   # chunked, fused encode
    chunked = s1.generate()
    assert np.asarray(s1.tensors["cond"]).shape[1] == 77  # slots populated

    s2 = make(unet_split=1)
    s2.option_set("callback", lambda ses, prg: 0)   # chunked, HOST encode
    host = s2.generate()
    np.testing.assert_allclose(chunked, host, atol=2e-5)


def test_turbo_shape_fused_matches_stepwise(ckpt, monkeypatch):
    """Distilled-model inference shape (few steps, cfg<=1): the fused
    single-dispatch path builds cond-only encoder rows and skips the
    uncond UNet pass; it must match the stepwise host-encode path."""
    patch_tiny_model_types(monkeypatch)

    def make():
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("model-type", "sd1")
        s.option_set("image-dim", 64)
        s.option_set("steps", 4)
        s.option_set("seed", 37)
        s.option_set("cfg-scale", 1.0)
        s.option_set("prompt", "a turbo test")
        return s

    fused = make().generate()           # no callback -> fused path
    s2 = make()
    s2.option_set("callback", lambda ses, prg: 0)  # forces stepwise path
    stepwise = s2.generate()
    np.testing.assert_allclose(fused, stepwise, atol=2e-5)
    # cfg<=1 must not have encoded or stored an uncond row
    assert s2.tensors["ncond"] is None


def test_cfg_rescale_session(ckpt, monkeypatch):
    """--cfg-rescale changes the latent (on tiny random weights the std
    ratio is ~1, so compare latents, not u8 images); fused and stepwise
    paths agree; out-of-range values are rejected."""
    def gen(stepwise=False, **opts):
        s = make_session(ckpt, monkeypatch, cfg_scale=5.0, steps=3,
                         no_decode=True, **opts)
        s.option_set("prompt", "a cat")
        s.option_set("nprompt", "a dog")
        if stepwise:
            s.step_observer = lambda i, lat: None
        s.generate()
        return np.asarray(s.tensors["latent"], np.float32)
    base = gen()
    a = gen(cfg_rescale=0.7)
    assert np.abs(a - base).max() > 0
    b = gen(cfg_rescale=0.7, stepwise=True)
    np.testing.assert_allclose(a, b, atol=2e-5)
    with pytest.raises(MlisError):
        make_session(ckpt, monkeypatch, cfg_rescale=1.5)


def test_slg_rejected_on_unet_models(ckpt, monkeypatch):
    """Skip-layer guidance is MMDiT-only: a UNet model raises E_OPT_VALUE
    at generate time (the option itself is accepted for serving parity)."""
    s = make_session(ckpt, monkeypatch, prompt="a cat")
    s.option_set("slg-scale", 2.5)
    with pytest.raises(MlisError):
        s.generate()


def test_guidance_option_validation(ckpt, monkeypatch):
    """ADVICE r3: negative scales, inverted step windows, and unsupported
    combos all surface as MlisError(E_OPT_VALUE), never ValueError or a
    silently ignored option."""
    s = make_session(ckpt, monkeypatch, prompt="a cat")
    with pytest.raises(MlisError):
        s.option_set("slg-scale", -1.0)
    with pytest.raises(MlisError):
        s.option_set("pag-scale", "-0.5")
    # inverted PAG window on a UNet model: rejected at generate time
    s.option_set("pag-scale", 2.0)
    s.option_set("pag-start", 0.5)
    s.option_set("pag-end", 0.25)
    with pytest.raises(MlisError) as ei:
        s.generate()
    assert ei.value.code == MlisError.E_OPT_VALUE
    assert "window" in str(ei.value)
    # pag + deepcache: clean option error, not a trace-time failure
    s.option_set("pag-start", 0.0)
    s.option_set("pag-end", 1.0)
    s.option_set("deepcache", 3)
    with pytest.raises(MlisError) as ei:
        s.generate()
    assert "deepcache" in str(ei.value)
