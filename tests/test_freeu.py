"""FreeU ("FreeU: Free Lunch in Diffusion U-Net"): backbone half-channel
scaling + skip low-frequency attenuation at the 4*n_ch / 2*n_ch decoder
blocks.  Beyond the reference; parity vs an independent NCHW/torch.fft
transcription, neutral-parameter no-op property, and the session option."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import TINY_UNET, patch_tiny_model_types, write_tiny_checkpoint
from mlimgsynth_tpu.api import MLImgSynth, MlisError
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.testing import _random_for_spec
from mlimgsynth_tpu.weights import _to_layout

from torch_ref import torch_unet

FREEU = (1.4, 1.6, 0.9, 0.2)
# 3 levels so the decoder hits BOTH the 4*n_ch (b1/s1) and 2*n_ch (b2/s2)
# dispatch channels
P3 = dataclasses.replace(TINY_UNET, ch_mult=(1, 2, 4),
                         transf_depth=(1, 1, 1), attn_res=(1, 2, 4))


def _make(P, seed=0):
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 7, P.n_ctx)))
    rng = np.random.default_rng(seed)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, 0.08)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return ckpt, model


def _forward(model, P, x, t, cond, freeu):
    ctx = B.Ctx(model, dtype=jnp.float32)
    out = unet_mod.unet_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), None, P, freeu=freeu)
    return np.asarray(out, np.float32).transpose(0, 3, 1, 2)


def test_freeu_matches_torch():
    ckpt, model = _make(P3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    t = np.array([500.0], np.float32)
    cond = rng.standard_normal((1, 7, P3.n_ctx)).astype(np.float32) * 0.3
    got = _forward(model, P3, x, t, cond, FREEU)
    with torch.no_grad():
        ref = torch_unet(ckpt, torch.from_numpy(x), torch.from_numpy(t),
                         torch.from_numpy(cond), None, P3,
                         freeu=FREEU).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4,
                               err_msg="FreeU forward mismatch vs torch")
    # and it actually changes the output
    base = _forward(model, P3, x, t, cond, None)
    assert np.abs(got - base).max() > 1e-3


def test_freeu_neutral_is_identity():
    """b=s=1: the channel scale is exact and the fft round-trip is within
    f32 noise of the plain forward."""
    _, model = _make(TINY_UNET, seed=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    t = np.array([400.0], np.float32)
    cond = rng.standard_normal((1, 7, TINY_UNET.n_ctx)).astype(np.float32)
    a = _forward(model, TINY_UNET, x, t, cond, None)
    b = _forward(model, TINY_UNET, x, t, cond, (1.0, 1.0, 1.0, 1.0))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_freeu_filter_vs_numpy():
    """The jax Fourier filter against a plain numpy.fft reimplementation
    (fftshifted center-region formulation)."""
    rng = np.random.default_rng(4)
    for H, W in ((8, 8), (7, 9)):
        h = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        got = np.asarray(unet_mod._freeu_filter(jnp.asarray(h), 0.5))
        hf = np.fft.fftshift(np.fft.fft2(h, axes=(1, 2)), axes=(1, 2))
        mask = np.ones((H, W, 1))
        mask[H // 2 - 1:H // 2 + 1, W // 2 - 1:W // 2 + 1] = 0.5
        ref = np.real(np.fft.ifft2(
            np.fft.ifftshift(hf * mask, axes=(1, 2)),
            axes=(1, 2))).astype(np.float32)
        np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def _session(ckpt, monkeypatch, **opts):
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 5)
    s.option_set("no-decode", True)
    s.option_set("prompt", "a cat")
    for k, v in opts.items():
        s.option_set(k.replace("_", "-"), v)
    return s


def test_freeu_session(ckpt, monkeypatch):
    s0 = _session(ckpt, monkeypatch)
    s0.generate()
    base = np.asarray(s0.tensors["latent"], np.float32)
    s1 = _session(ckpt, monkeypatch, freeu="1.3,1.4,0.9,0.2")
    s1.generate()
    a = np.asarray(s1.tensors["latent"], np.float32)
    assert np.abs(a - base).max() > 1e-5
    assert "FreeU: 1.3,1.4,0.9,0.2" in s1.infotext
    # stepwise path agrees with the fused path
    s2 = _session(ckpt, monkeypatch, freeu="1.3,1.4,0.9,0.2")
    s2.step_observer = lambda i, lat: None
    s2.generate()
    b = np.asarray(s2.tensors["latent"], np.float32)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_freeu_auto_and_errors(ckpt, monkeypatch):
    s = _session(ckpt, monkeypatch, freeu="y")
    assert s._freeu_parse("y") == "auto"
    s.setup()
    assert s._freeu_resolve() == MLImgSynth._FREEU_DEFAULTS["sd1"]
    with pytest.raises(MlisError):
        s.option_set("freeu", "1.0,2.0")   # wrong arity fails fast
    s.option_set("freeu", "n")
    assert s._freeu_resolve() is None
