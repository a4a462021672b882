"""UNet / VAE numeric parity vs independent torch kernels.

Same pattern as test_clip_parity.py (which checks CLIP against HuggingFace):
random weights in CHECKPOINT layout are consumed natively by a torch mirror
(tests/torch_ref.py) and routed through the loader's layout transforms on
the JAX side; outputs must match to float tolerance.  This catches
transcription errors in the conv/norm/attention math and in the layout
conversions (VERDICT r1 item 2).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import TINY_UNET, TINY_UNET_XL, TINY_VAE
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.models import vae as vae_mod
from mlimgsynth_tpu.testing import _random_for_spec
from mlimgsynth_tpu.weights import _to_layout

from torch_ref import torch_unet, torch_vae_decode, torch_vae_encode


def _make_params(spec, seed=0, scale=0.08):
    """(checkpoint-layout params for torch, model-layout params for jax)."""
    rng = np.random.default_rng(seed)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, scale)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return ckpt, model


def test_unet_matches_torch():
    P = TINY_UNET
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)), jnp.zeros((2, 7, P.n_ctx)))
    ckpt, model = _make_params(spec)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([999.0, 500.0], np.float32)
    cond = rng.standard_normal((2, 7, P.n_ctx)).astype(np.float32) * 0.3

    ctx = B.Ctx(model, dtype=jnp.float32)
    got = np.asarray(unet_mod.unet_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), None, P), np.float32).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = torch_unet(ckpt, torch.from_numpy(x), torch.from_numpy(t),
                         torch.from_numpy(cond), None, P).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4,
                               err_msg="UNet forward mismatch vs torch")


def test_unet_sdxl_label_matches_torch():
    P = TINY_UNET_XL
    spec = B.trace_spec(
        lambda ctx, x, t, c, l: unet_mod.unet_apply(ctx, x, t, c, l, P),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, P.n_ctx)), jnp.zeros((1, P.ch_adm_in)))
    ckpt, model = _make_params(spec, seed=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    t = np.array([700.0], np.float32)
    cond = rng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.3
    label = rng.standard_normal((1, P.ch_adm_in)).astype(np.float32) * 0.3

    ctx = B.Ctx(model, dtype=jnp.float32)
    got = np.asarray(unet_mod.unet_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), jnp.asarray(label), P),
        np.float32).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref = torch_unet(ckpt, torch.from_numpy(x), torch.from_numpy(t),
                         torch.from_numpy(cond), torch.from_numpy(label),
                         P).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_vae_matches_torch():
    P = TINY_VAE
    spec = B.trace_spec(
        lambda ctx, x: vae_mod.vae_encode_apply(ctx, x, P),
        jnp.zeros((1, 32, 32, 3)))
    spec.update(B.trace_spec(
        lambda ctx, x: vae_mod.vae_decode_apply(ctx, x, P),
        jnp.zeros((1, 4, 4, P.ch_z))))
    ckpt, model = _make_params(spec, seed=4, scale=0.05)
    rng = np.random.default_rng(5)
    img = (rng.random((1, 3, 32, 32)).astype(np.float32) * 2 - 1)
    lat = rng.standard_normal((1, P.ch_z, 4, 4)).astype(np.float32) * 0.3

    ctx = B.Ctx(model, dtype=jnp.float32)
    got_m = np.asarray(vae_mod.vae_encode_apply(
        ctx, jnp.asarray(img.transpose(0, 2, 3, 1)), P),
        np.float32).transpose(0, 3, 1, 2)
    got_d = np.asarray(vae_mod.vae_decode_apply(
        ctx, jnp.asarray(lat.transpose(0, 2, 3, 1)), P),
        np.float32).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref_m = torch_vae_encode(ckpt, torch.from_numpy(img), P).numpy()
        ref_d = torch_vae_decode(ckpt, torch.from_numpy(lat), P).numpy()
    np.testing.assert_allclose(got_m, ref_m, atol=3e-4,
                               err_msg="VAE encoder mismatch vs torch")
    np.testing.assert_allclose(got_d, ref_d, atol=3e-4,
                               err_msg="VAE decoder mismatch vs torch")


def test_denoise_scalings_match_kdiffusion():
    """c_in / v-param c_skip,c_out formulas vs a direct numpy transcription
    of k-diffusion's scalings (ref: src/unet.c:460-498)."""
    P = TINY_UNET
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 7, P.n_ctx)))
    _, model = _make_params(spec, seed=6)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    cond = rng.standard_normal((1, 7, P.n_ctx)).astype(np.float32) * 0.3
    sigma, t = 2.5, 600.0
    ctx = B.Ctx(model, dtype=jnp.float32)
    out = np.asarray(unet_mod.denoise(
        ctx, jnp.asarray(x), sigma, t, jnp.asarray(cond), None, P))
    c_in = 1.0 / np.sqrt(sigma * sigma + 1.0)
    raw = np.asarray(unet_mod.unet_apply(
        ctx, jnp.asarray(x * c_in), jnp.full((1,), t), jnp.asarray(cond),
        None, P))
    np.testing.assert_allclose(out, raw, atol=1e-5)

    Pv = unet_mod.UnetParams(
        n_ch=P.n_ch, ch_mult=P.ch_mult, transf_depth=P.transf_depth,
        attn_res=P.attn_res, n_head=P.n_head, n_te=P.n_te, n_ctx=P.n_ctx,
        vparam=True)
    outv = np.asarray(unet_mod.denoise(
        ctx, jnp.asarray(x), sigma, t, jnp.asarray(cond), None, Pv))
    c_skip = sigma / (sigma * sigma + 1.0)
    c_out = 1.0 / np.sqrt(sigma * sigma + 1.0)
    np.testing.assert_allclose(outv, raw * c_out + x * c_skip, atol=1e-5)


def test_vae_sd3_matches_torch():
    """16-channel-convention flow VAE (shift factor, no quant convs) vs the
    torch kernels — exercises the SD3 VaeParams fields end to end."""
    from mlimgsynth_tpu.testing import TINY_VAE_SD3 as P
    spec = B.trace_spec(
        lambda ctx, x: vae_mod.vae_encode_apply(ctx, x, P),
        jnp.zeros((1, 32, 32, 3)))
    spec.update(B.trace_spec(
        lambda ctx, x: vae_mod.vae_decode_apply(ctx, x, P),
        jnp.zeros((1, 4, 4, P.ch_z))))
    assert "vae.quant_conv.weight" not in spec
    assert "vae.post_quant_conv.weight" not in spec
    ckpt, model = _make_params(spec, seed=8, scale=0.05)
    rng = np.random.default_rng(9)
    img = (rng.random((1, 3, 32, 32)).astype(np.float32) * 2 - 1)
    lat = rng.standard_normal((1, P.ch_z, 4, 4)).astype(np.float32) * 0.3

    ctx = B.Ctx(model, dtype=jnp.float32)
    got_m = np.asarray(vae_mod.vae_encode_apply(
        ctx, jnp.asarray(img.transpose(0, 2, 3, 1)), P),
        np.float32).transpose(0, 3, 1, 2)
    got_d = np.asarray(vae_mod.vae_decode_apply(
        ctx, jnp.asarray(lat.transpose(0, 2, 3, 1)), P),
        np.float32).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref_m = torch_vae_encode(ckpt, torch.from_numpy(img), P).numpy()
        ref_d = torch_vae_decode(ckpt, torch.from_numpy(lat), P).numpy()
    np.testing.assert_allclose(got_m, ref_m, atol=3e-4)
    np.testing.assert_allclose(got_d, ref_d, atol=3e-4)
    # latent helpers apply the shift: z = (mean - shift) * scale
    moments = rng.standard_normal((1, 2, 2, 2 * P.ch_z)).astype(np.float32)
    z = np.asarray(vae_mod.latent_mean(jnp.asarray(moments), P))
    want = (moments[..., :P.ch_z] - P.shift_factor) * P.scale_factor
    np.testing.assert_allclose(z, want, atol=1e-6)
