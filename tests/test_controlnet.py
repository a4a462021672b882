"""ControlNet: torch parity, name mapping, and session e2e.

The forward is checked against an independent torch transcription
(tests/torch_ref.torch_controlnet) with weights in CHECKPOINT layout routed
through the loader transforms on the JAX side, same pattern as
test_unet_vae_parity.py.  ControlNet is a beyond-reference addition (the
reference lists it under Future plans, README.md:75).
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from helpers import TINY_UNET, patch_tiny_model_types, write_tiny_checkpoint
from mlimgsynth_tpu import nameconv
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import controlnet as cnet_mod
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.testing import (_random_for_spec, tiny_cnet_spec,
                                    write_tiny_controlnet)
from mlimgsynth_tpu.weights import _to_layout

from torch_ref import torch_controlnet, torch_unet


def _make_params(spec, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)
    ckpt, model = {}, {}
    for name, ps in spec.items():
        arr = _random_for_spec(rng, ps, scale)
        ckpt[name] = arr
        model[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return ckpt, model


def test_controlnet_matches_torch():
    P = TINY_UNET
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(ctx, x, t, c, None, P),
        jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)), jnp.zeros((2, 7, P.n_ctx)))
    spec.update(tiny_cnet_spec(P))
    ckpt, model = _make_params(spec, seed=11)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([999.0, 500.0], np.float32)
    cond = rng.standard_normal((2, 7, P.n_ctx)).astype(np.float32) * 0.3
    hint = rng.random((1, 3, 64, 64)).astype(np.float32)
    strength = 0.8

    ctx = B.Ctx(model, dtype=jnp.float32)
    feat = cnet_mod.hint_apply(ctx, jnp.asarray(hint.transpose(0, 2, 3, 1)),
                               P)
    res = cnet_mod.controlnet_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), None, feat, P)
    res = [r * strength for r in res]
    got = np.asarray(unet_mod.unet_apply(
        ctx, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(cond), None, P, control=res),
        np.float32).transpose(0, 3, 1, 2)

    with torch.no_grad():
        res_t = torch_controlnet(
            ckpt, torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(cond), None, torch.from_numpy(hint), P,
            strength=strength)
        ref = torch_unet(ckpt, torch.from_numpy(x), torch.from_numpy(t),
                         torch.from_numpy(cond), None, P,
                         control=res_t).numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4,
                               err_msg="ControlNet-conditioned UNet "
                               "mismatch vs torch")


def test_controlnet_residual_count_and_broadcast():
    """Residual count matches the skip count; batch-1 hint features
    broadcast against a CFG-stacked batch."""
    P = TINY_UNET
    spec = tiny_cnet_spec(P)
    _, model = _make_params(spec, seed=13)
    ctx = B.Ctx(model, dtype=jnp.float32)
    feat = cnet_mod.hint_apply(ctx, jnp.zeros((1, 64, 64, 3)), P)
    assert feat.shape == (1, 8, 8, P.n_ch)
    res = cnet_mod.controlnet_apply(ctx, jnp.zeros((4, 8, 8, 4)),
                                    jnp.zeros((4,)),
                                    jnp.zeros((4, 7, P.n_ctx)), None, feat, P)
    # tiny: 2 levels x 2 res blocks + conv_in + 1 downsample = 6 skips + mid
    n_skips = 1 + sum(1 + P.n_res_blk if im else P.n_res_blk
                      for im in range(len(P.ch_mult)))
    assert len(res) == n_skips + 1
    assert all(r.shape[0] == 4 for r in res)


CNET_NAME_CASES = [
    # CompVis control_model layout
    ("control_model.input_hint_block.0.weight", "cnet.hint.0.weight"),
    ("control_model.input_hint_block.14.bias", "cnet.hint.7.bias"),
    ("control_model.input_hint_block.3.weight", None),  # SiLU slot
    ("control_model.zero_convs.5.0.weight", "cnet.zc.5.weight"),
    ("control_model.middle_block_out.0.bias", "cnet.mid.out.bias"),
    ("control_model.time_embed.0.weight", "cnet.time_embed.0.weight"),
    ("control_model.input_blocks.0.0.weight", "cnet.in.conv.weight"),
    ("control_model.input_blocks.1.0.in_layers.2.weight",
     "cnet.in.1.0.conv1.weight"),
    ("control_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight",
     "cnet.in.4.1.transf.0.attn2.k_proj.weight"),
    ("control_model.middle_block.1.transformer_blocks.0.ff.net.0.proj.weight",
     "cnet.mid.1.transf.0.ff.net.0.proj.weight"),
    ("control_model.label_emb.0.0.weight", "cnet.label_embed.0.weight"),
    # diffusers ControlNetModel layout
    ("controlnet_cond_embedding.conv_in.weight", "cnet.hint.0.weight"),
    ("controlnet_cond_embedding.blocks.2.bias", "cnet.hint.3.bias"),
    ("controlnet_cond_embedding.conv_out.weight", "cnet.hint.7.weight"),
    ("controlnet_down_blocks.3.weight", "cnet.zc.3.weight"),
    ("controlnet_mid_block.bias", "cnet.mid.out.bias"),
    ("time_embedding.linear_1.weight", "cnet.time_embed.0.weight"),
    ("time_embedding.linear_2.bias", "cnet.time_embed.2.bias"),
    ("conv_in.weight", "cnet.in.conv.weight"),
    ("down_blocks.0.resnets.0.conv1.weight", "cnet.in.1.0.conv1.weight"),
    ("mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight",
     "cnet.mid.1.transf.0.attn1.q_proj.weight"),
]


@pytest.mark.parametrize("raw,want", CNET_NAME_CASES,
                         ids=[c[0][:48] for c in CNET_NAME_CASES])
def test_normalize_cnet_name(raw, want):
    assert nameconv.normalize_cnet_name(raw) == want


def test_cnet_name_roundtrip():
    spec = tiny_cnet_spec()
    for name in spec:
        ck = nameconv.internal_to_cnet_ckpt(name)
        assert ck is not None, name
        assert nameconv.normalize_cnet_name(ck) == name


# ---------------------------------------------------------------------------
# Session e2e
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("cnet")
    ck = d / "tiny.safetensors"
    cn = d / "tiny_cnet.safetensors"
    write_tiny_checkpoint(ck)
    write_tiny_controlnet(cn)
    return str(ck), str(cn)


@pytest.fixture
def session(paths, monkeypatch):
    from mlimgsynth_tpu.api import MLImgSynth
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", paths[0])
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 3)
    s.option_set("seed", 42)
    s.option_set("prompt", "a cat")
    return s


def _hint_u8():
    return (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(
        np.uint8)


def test_session_controlnet(session, paths):
    from mlimgsynth_tpu.api import MlisError
    base = np.asarray(session.generate())

    session.option_set("control-net", paths[1])
    # missing control image is an error
    session.option_set("prompt", "a cat")
    with pytest.raises(MlisError):
        session.generate()

    session.option_set("control-image", _hint_u8())
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    ctl = np.asarray(session.generate())
    assert ctl.shape == base.shape and np.isfinite(ctl).all()
    assert (ctl != base).any(), "control had no effect"
    assert "ControlNet: tiny_cnet" in session.infotext
    assert "ControlNet strength: 1" in session.infotext

    # strength 0 reproduces the uncontrolled output exactly
    session.option_set("control-strength", 0.0)
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    z = np.asarray(session.generate())
    np.testing.assert_array_equal(z, base)

    # wrong-size hint is an error
    session.option_set("control-strength", 1.0)
    session.option_set("control-image",
                       np.zeros((32, 32, 3), np.uint8))
    session.option_set("prompt", "a cat")
    with pytest.raises(MlisError):
        session.generate()

    # turning it off restores the baseline
    session.option_set("control-net", "")
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    off = np.asarray(session.generate())
    np.testing.assert_array_equal(off, base)


def test_generate_batch_controlnet(session, paths):
    """Session-level control applies to the merged serving batch and
    matches the single-request path per row."""
    session.option_set("control-net", paths[1])
    session.option_set("control-image", _hint_u8())
    session.option_set("prompt", "a cat")
    session.option_set("seed", 7)
    single = np.asarray(session.generate())

    session.option_set("control-image", _hint_u8())
    imgs, infotexts = session.generate_batch(
        [{"prompt": "a cat", "seed": 7}, {"prompt": "a dog", "seed": 8}])
    assert imgs.shape[0] == 2 and np.isfinite(imgs).all()
    np.testing.assert_allclose(imgs[0:1], single, atol=1e-5)
    assert "ControlNet: tiny_cnet" in infotexts[0]


def test_session_controlnet_stepwise(session, paths):
    """The chunked/cancellable path (step callback) carries control too."""
    session.option_set("control-net", paths[1])
    session.option_set("control-image", _hint_u8())
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    fused = np.asarray(session.generate())

    session.option_set("callback", lambda ses, prg: 0)  # forces stepwise
    session.option_set("control-image", _hint_u8())
    session.option_set("prompt", "a cat")
    session.option_set("seed", 42)
    step = np.asarray(session.generate())
    np.testing.assert_allclose(step, fused, atol=1e-5)
