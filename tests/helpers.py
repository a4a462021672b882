"""Shared test helpers: synthetic tiny-SD checkpoints in CompVis layout."""
import numpy as np
import jax.numpy as jnp

from mlimgsynth_tpu import nameconv
from mlimgsynth_tpu.api import ModelTypeDef
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import clip as clip_mod
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.models import vae as vae_mod
from mlimgsynth_tpu.tokenizer import ClipParams

TINY_CLIP = ClipParams(n_vocab=49408, n_token=77, d_embed=32, n_interm=64,
                       n_head=4, n_layer=2)
TINY_UNET = unet_mod.UnetParams(
    n_ch=32, ch_mult=(1, 2), transf_depth=(1, 1), attn_res=(1, 2),
    n_head=4, n_te=64, n_ctx=32)
TINY_VAE = vae_mod.VaeParams(ch=32, ch_mult=(1, 1, 2, 2))

TINY_MODEL_TYPE = ModelTypeDef("sd1", TINY_CLIP, None, TINY_UNET, TINY_VAE,
                               64, 1)


def tiny_specs():
    spec = {}
    spec.update(B.trace_spec(
        lambda ctx, toks: clip_mod.clip_text_apply(ctx, toks, TINY_CLIP),
        jnp.zeros((1, 77), jnp.int32)))
    spec.update(B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None,
                                                 TINY_UNET),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 77, 32))))
    spec.update(B.trace_spec(
        lambda ctx, x: vae_mod.vae_encode_apply(ctx, x, TINY_VAE),
        jnp.zeros((1, 64, 64, 3))))
    spec.update(B.trace_spec(
        lambda ctx, x: vae_mod.vae_decode_apply(ctx, x, TINY_VAE),
        jnp.zeros((1, 8, 8, 4))))
    return spec


def spec_to_checkpoint_arrays(spec, seed=0, scale=0.05):
    """Random torch-layout arrays keyed by CompVis checkpoint names."""
    rng = np.random.default_rng(seed)
    out = {}
    for name, ps in spec.items():
        cv = nameconv.internal_to_compvis(name)
        assert cv is not None, f"no CompVis name for {name}"
        back = nameconv.normalize_name(cv)
        assert back == name, f"roundtrip failed: {name} -> {cv} -> {back}"
        shape = ps.shape
        if ps.kind == B.LINEAR_W:
            shape = (shape[1], shape[0])
        elif ps.kind == B.CONV_W:
            kh, kw, ci, co = shape
            shape = (co, ci, kh, kw)
        out[cv] = (rng.standard_normal(shape) * scale).astype(np.float32)
    return out


def write_tiny_checkpoint(path, seed=0, dtype=np.float32):
    from safetensors.numpy import save_file
    spec = tiny_specs()
    arrays = spec_to_checkpoint_arrays(spec, seed=seed)
    if dtype != np.float32:
        arrays = {k: v.astype(dtype) for k, v in arrays.items()}
    save_file(arrays, str(path))
    return arrays


def patch_tiny_model_types(monkeypatch):
    from mlimgsynth_tpu import api
    monkeypatch.setattr(api, "_model_types",
                        lambda: {"sd1": TINY_MODEL_TYPE})
