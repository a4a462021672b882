"""Seamless tiling (A1111 "tiling"): circular conv padding makes the
UNet and VAE wrap-equivariant (attention has no positional encoding, so
a spatial roll of the input rolls the output exactly)."""
import numpy as np
import pytest
import jax.numpy as jnp

from mlimgsynth_tpu.models import blocks as B
from helpers import (TINY_MODEL_TYPE, patch_tiny_model_types,
                     write_tiny_checkpoint)


def _tiny_unet_params(P):
    from mlimgsynth_tpu.models import unet as U
    spec = B.trace_spec(
        lambda ctx, x, t, c: U.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, P.n_ctx)))
    r = np.random.RandomState(3)
    return {k: (r.randn(*ps.shape) * 0.05).astype(np.float32)
            for k, ps in spec.items()}


def test_conv2d_wrap_equivariance():
    r = np.random.RandomState(0)
    params = {"c.weight": r.randn(3, 3, 4, 8).astype(np.float32),
              "c.bias": r.randn(8).astype(np.float32)}
    x = jnp.asarray(r.randn(1, 8, 8, 4), jnp.float32)
    ctx = B.Ctx(params, dtype=jnp.float32, tiling=True)
    y = np.asarray(B.conv2d(ctx, "c", x, 8))
    y_roll = np.asarray(B.conv2d(ctx, "c", jnp.roll(x, (3, 2), (1, 2)), 8))
    np.testing.assert_allclose(np.roll(y, (3, 2), (1, 2)), y_roll,
                               atol=1e-5)


def test_unet_wrap_equivariance():
    from mlimgsynth_tpu.models import unet as U
    from mlimgsynth_tpu.testing import TINY_UNET
    P = TINY_UNET
    params = _tiny_unet_params(P)
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1, 8, 8, 4), jnp.float32)
    t = jnp.asarray([5.0])
    c = jnp.asarray(r.randn(1, 77, P.n_ctx), jnp.float32)
    ctx = B.Ctx(params, dtype=jnp.float32, tiling=True)
    y = np.asarray(U.unet_apply(ctx, x, t, c, None, P))
    y2 = np.asarray(U.unet_apply(
        ctx, jnp.roll(x, (2, 4), (1, 2)), t, c, None, P))
    np.testing.assert_allclose(np.roll(y, (2, 4), (1, 2)), y2, atol=2e-4)
    # and without tiling, equivariance breaks (zero pads see the seam)
    ctx0 = B.Ctx(params, dtype=jnp.float32, tiling=False)
    z = np.asarray(U.unet_apply(ctx0, x, t, c, None, P))
    z2 = np.asarray(U.unet_apply(
        ctx0, jnp.roll(x, (2, 4), (1, 2)), t, c, None, P))
    assert not np.allclose(np.roll(z, (2, 4), (1, 2)), z2, atol=2e-4)


def test_vae_decode_wrap_equivariance():
    from mlimgsynth_tpu.models import vae as V
    from mlimgsynth_tpu.testing import TINY_VAE
    P = TINY_VAE
    spec = B.trace_spec(
        lambda ctx, z: V.vae_decode_apply(ctx, z, P),
        jnp.zeros((1, 8, 8, P.ch_z)))
    r = np.random.RandomState(2)
    params = {k: (r.randn(*ps.shape) * 0.05).astype(np.float32)
              for k, ps in spec.items()}
    z = jnp.asarray(r.randn(1, 8, 8, P.ch_z), jnp.float32)
    ctx = B.Ctx(params, dtype=jnp.float32, tiling=True)
    y = np.asarray(V.vae_decode_apply(ctx, z, P))
    y2 = np.asarray(V.vae_decode_apply(ctx, jnp.roll(z, (3, 1), (1, 2)),
                                       P))
    f = P.f_down
    np.testing.assert_allclose(np.roll(y, (3 * f, 1 * f), (1, 2)), y2,
                               atol=2e-4)


def test_tiling_generate_e2e(tmp_path, monkeypatch):
    from mlimgsynth_tpu.api import MLImgSynth
    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "sd1.safetensors"
    write_tiny_checkpoint(ckpt)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 6)
    s.option_set("prompt", "a texture")
    base = s.generate()
    s.option_set("tiling", 1)
    s.option_set("seed", 6)
    s.option_set("prompt", "a texture")
    tiled = s.generate()
    assert tiled.shape == base.shape
    assert not np.array_equal(tiled, base)
    # seamless: wrapping the output and re-rolling matches generating
    # from rolled noise is covered at the model level above; here just
    # determinism of the tiled path
    s.option_set("seed", 6)
    s.option_set("prompt", "a texture")
    np.testing.assert_array_equal(tiled, s.generate())
