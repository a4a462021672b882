"""MMDiT (SD3 family) forward parity vs independent torch kernels.

Same harness as test_unet_vae_parity.py: random weights in CHECKPOINT
layout are consumed natively by the torch transcription (torch_ref.py,
written from the SD3 paper's block structure) and routed through the
loader's layout transforms on the JAX side."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import mmdit as mmdit_mod
from mlimgsynth_tpu.testing import _random_for_spec
from mlimgsynth_tpu.weights import _to_layout

from torch_ref import torch_mmdit

TINY_MMDIT = mmdit_mod.MmditParams(
    depth=3, d_model=32, n_head=2, patch=2, n_ch_in=8, n_ch_out=8,
    d_ctx_in=16, d_pooled=24, pos_embed_max=8, d_t_embed=16,
    n_ctx=16, ch_adm_in=24)


def _make_params(spec, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, scale)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return ckpt, model


def _spec(P, hw=8, n=2, s_ctx=5):
    return B.trace_spec(
        lambda ctx, x, t, c, y: mmdit_mod.mmdit_apply(ctx, x, t, c, y, P),
        jnp.zeros((n, hw, hw, P.n_ch_in)), jnp.zeros((n,)),
        jnp.zeros((n, s_ctx, P.d_ctx_in)), jnp.zeros((n, P.d_pooled)))


@pytest.mark.parametrize("qk_norm", [False, True])
def test_mmdit_matches_torch(qk_norm):
    P = dataclasses.replace(TINY_MMDIT, qk_norm=qk_norm)
    spec = _spec(P)
    ckpt, model = _make_params(spec)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, P.n_ch_in, 8, 8)).astype(np.float32)
    t = np.array([1000.0, 300.0], np.float32)
    cond = rng.standard_normal((2, 5, P.d_ctx_in)).astype(np.float32) * 0.3
    pooled = rng.standard_normal((2, P.d_pooled)).astype(np.float32) * 0.3

    ctx = B.Ctx(model, dtype=jnp.float32)
    got = np.asarray(mmdit_mod.mmdit_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), jnp.asarray(pooled), P),
        np.float32).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = torch_mmdit(ckpt, torch.from_numpy(x), torch.from_numpy(t),
                          torch.from_numpy(cond), torch.from_numpy(pooled),
                          P).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4,
                               err_msg="MMDiT forward mismatch vs torch")


def test_mmdit_denoise_is_velocity():
    """The flow wrapper returns the raw model output (dx/dsigma) with no
    input/output scalings, in f32."""
    P = TINY_MMDIT
    spec = _spec(P)
    _, model = _make_params(spec)
    ctx = B.Ctx(model, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, P.n_ch_in)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 5, P.d_ctx_in)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, P.d_pooled)), jnp.float32)
    sigma = 0.7
    t = sigma * P.n_step_train
    d = mmdit_mod.denoise(ctx, x, sigma, t, cond, pooled, P)
    raw = mmdit_mod.mmdit_apply(ctx, x, jnp.full((1,), t), cond, pooled, P)
    assert d.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(d), np.asarray(raw, np.float32),
                               atol=1e-6)


def test_mmdit_pos_embed_crop_center():
    """A smaller input uses the CENTER of the pos-embed grid."""
    P = TINY_MMDIT
    spec = _spec(P, hw=8)
    _, model = _make_params(spec)
    # make the pos embed identifiable
    g = P.pos_embed_max
    pe = np.arange(g * g, dtype=np.float32).reshape(1, g * g, 1)
    model = dict(model)
    model["mmdit.pos_embed"] = jnp.asarray(
        np.broadcast_to(pe, (1, g * g, P.width)).copy())
    ctx = B.Ctx(model, dtype=jnp.float32)
    got = mmdit_mod._pos_embed_crop(ctx, "mmdit", 2, 2, P)
    grid = np.arange(g * g, dtype=np.float32).reshape(g, g)
    want = grid[3:5, 3:5].reshape(-1)
    np.testing.assert_allclose(np.asarray(got)[0, :, 0], want)


def test_mmdit_x_dual_attention_matches_torch():
    """MMDiT-X (SD3.5-medium): dual attention in the flagged x-blocks
    (attn2 over latent tokens only, 9-chunk adaLN) vs torch."""
    P = dataclasses.replace(TINY_MMDIT, qk_norm=True,
                            x_self_attn_layers=(0, 1))
    spec = _spec(P)
    assert "mmdit.joint_blocks.0.x_block.attn2.qkv.weight" in spec
    assert "mmdit.joint_blocks.2.x_block.attn2.qkv.weight" not in spec
    ckpt, model = _make_params(spec, seed=3)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, P.n_ch_in, 8, 8)).astype(np.float32)
    t = np.array([800.0, 100.0], np.float32)
    cond = rng.standard_normal((2, 5, P.d_ctx_in)).astype(np.float32) * 0.3
    pooled = rng.standard_normal((2, P.d_pooled)).astype(np.float32) * 0.3

    ctx = B.Ctx(model, dtype=jnp.float32)
    got = np.asarray(mmdit_mod.mmdit_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), jnp.asarray(pooled), P),
        np.float32).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref = torch_mmdit(ckpt, torch.from_numpy(x), torch.from_numpy(t),
                          torch.from_numpy(cond), torch.from_numpy(pooled),
                          P).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4,
                               err_msg="MMDiT-X forward mismatch vs torch")
