"""Inpaint-variant UNet (9 input channels, e.g. sd-v1-5-inpainting).

Beyond-reference addition (the reference's Future plans lists "Other
models?"): the session auto-detects the checkpoint's UNet input width and
feeds the diffusers SD-inpaint conditioning — repaint mask + deterministic
masked-image latent — as loop-constant extra channels (concatenated after
the c_in scaling, since they are not part of the noised state).
"""
import dataclasses

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from helpers import TINY_UNET, patch_tiny_model_types
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.testing import (_random_for_spec,
                                    write_tiny_inpaint_checkpoint)
from mlimgsynth_tpu.weights import _to_layout

from torch_ref import torch_unet

TINY_UNET9 = dataclasses.replace(TINY_UNET, n_ch_in=9)


def test_denoise_extra_channels_match_torch():
    """denoise(extra_ch=...) == torch forward on the manual 9ch concat
    (c_in scales only the 4 latent channels)."""
    P = TINY_UNET9
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((2, 8, 8, 9)), jnp.zeros((2,)), jnp.zeros((2, 7, P.n_ctx)))
    rng = np.random.default_rng(21)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, 0.08)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))

    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    extra = rng.standard_normal((1, 5, 8, 8)).astype(np.float32)
    cond = rng.standard_normal((2, 7, P.n_ctx)).astype(np.float32) * 0.3
    sigma, t = 2.5, 600.0

    ctx = B.Ctx(model, dtype=jnp.float32)
    got = np.asarray(unet_mod.denoise(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), sigma, t,
        jnp.asarray(cond), None, P,
        extra_ch=jnp.asarray(extra.transpose(0, 2, 3, 1))),
        np.float32).transpose(0, 3, 1, 2)

    c_in = 1.0 / np.sqrt(sigma * sigma + 1.0)
    x9 = np.concatenate([x * c_in, np.repeat(extra, 2, 0)],
                        axis=1).astype(np.float32)
    with torch.no_grad():
        ref = torch_unet(ckpt, torch.from_numpy(x9),
                         torch.from_numpy(np.full((2,), t, np.float32)),
                         torch.from_numpy(cond), None, P).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4)


@pytest.fixture(scope="module")
def ckpt9(tmp_path_factory):
    p = tmp_path_factory.mktemp("inpaint") / "tiny9.safetensors"
    write_tiny_inpaint_checkpoint(p)
    return str(p)


@pytest.fixture
def session(ckpt9, monkeypatch):
    from mlimgsynth_tpu.api import MLImgSynth
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt9)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 3)
    s.option_set("seed", 42)
    s.option_set("prompt", "a cat")
    return s


def test_inpaint_model_autodetect_and_txt2img(session):
    """n_ch_in=9 detected from the checkpoint; txt2img runs with the
    repaint-everything default channels."""
    img = np.asarray(session.generate())
    assert session._mt.unet_p.n_ch_in == 9
    assert img.shape == (1, 3, 64, 64) and np.isfinite(img).all()


def test_inpaint_model_mask_conditioning(session):
    """A mask changes the conditioning channels (different output), and
    the old latent-blend hack is NOT applied (the model owns the mask)."""
    rng = np.random.default_rng(5)
    init = (rng.random((64, 64, 3)) * 255).astype(np.uint8)

    session.option_set("image", init)
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    session.option_set("f-t-ini", 0.8)
    a = np.asarray(session.generate())

    mask = np.zeros((1, 1, 64, 64), np.float32)
    mask[..., :32, :] = 1.0          # keep the top half
    session.option_set("image", init)
    session.option_set("image_mask", mask)
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    b = np.asarray(session.generate())
    assert np.isfinite(b).all()
    assert (a != b).any(), "mask conditioning had no effect"


def test_inpaint_model_batch_txt2img(session):
    imgs, infos = session.generate_batch(
        [{"prompt": "a cat", "seed": 7}, {"prompt": "a dog", "seed": 8}])
    assert imgs.shape[0] == 2 and np.isfinite(imgs).all()
