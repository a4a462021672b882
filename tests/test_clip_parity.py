"""CLIP text encoder parity vs HuggingFace transformers (independent impl).

Builds a tiny random CLIPTextModel, routes its state dict through the
checkpoint name normalizer + layout transforms (the same path a real
checkpoint takes), and compares outputs.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import clip as clip_mod
from mlimgsynth_tpu.nameconv import normalize_name
from mlimgsynth_tpu.tokenizer import ClipParams
from mlimgsynth_tpu.weights import _to_layout

TINY = ClipParams(n_vocab=99, n_token=16, d_embed=64, n_interm=128,
                  n_head=4, n_layer=2, tok_start=97, tok_end=98, tok_pad=98)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(
        vocab_size=TINY.n_vocab, hidden_size=TINY.d_embed,
        intermediate_size=TINY.n_interm, num_hidden_layers=TINY.n_layer,
        num_attention_heads=TINY.n_head, max_position_embeddings=TINY.n_token,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    torch.manual_seed(0)
    model = CLIPTextModel(cfg).eval()
    return model


def params_from_hf(model):
    spec = B.trace_spec(
        lambda ctx, toks: clip_mod.clip_text_apply(ctx, toks, TINY),
        jnp.zeros((1, TINY.n_token), jnp.int32))
    params = {}
    for raw, w in model.state_dict().items():
        # state dict names look like "text_model.encoder.layers.0..." ;
        # route through the CompVis prefix the normalizer expects
        name = normalize_name("cond_stage_model.transformer." + raw)
        if name is None or name not in spec:
            continue
        params[name] = jnp.asarray(
            _to_layout(w.numpy().astype(np.float32), spec[name], name))
    missing = set(spec) - set(params)
    assert not missing, f"missing params: {sorted(missing)[:5]}"
    return params


def test_clip_matches_transformers(hf_model):
    params = params_from_hf(hf_model)
    toks = np.array([[97, 5, 17, 42, 98] + [98] * 11,
                     [97, 1, 98] + [98] * 13], np.int64)
    with torch.no_grad():
        ref = hf_model(input_ids=torch.from_numpy(toks)).last_hidden_state
    ctx = B.Ctx(params, dtype=jnp.float32)
    got, _ = clip_mod.clip_text_apply(ctx, jnp.asarray(toks, jnp.int32), TINY)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


def test_clip_skip_drops_layers(hf_model):
    params = params_from_hf(hf_model)
    toks = jnp.asarray(np.array([[97, 5, 17, 98] + [98] * 12]), jnp.int32)
    ctx = B.Ctx(params, dtype=jnp.float32)
    full, _ = clip_mod.clip_text_apply(ctx, toks, TINY, clip_skip=1)
    skip, _ = clip_mod.clip_text_apply(ctx, toks, TINY, clip_skip=2)
    # skipping the last layer must change the output
    assert not np.allclose(np.asarray(full), np.asarray(skip))


def test_clip_feat_projection(hf_model):
    params = params_from_hf(hf_model)
    # random projection (not in the HF text model state dict)
    rng = np.random.default_rng(0)
    params["clip.text.text_proj"] = jnp.asarray(
        rng.standard_normal((TINY.d_embed, TINY.d_embed), np.float32))
    toks = np.array([[97, 5, 17, 98] + [98] * 12])
    ctx = B.Ctx(params, dtype=jnp.float32)
    emb, feat = clip_mod.clip_text_apply(
        ctx, jnp.asarray(toks, jnp.int32), TINY,
        feat_tok_idx=jnp.asarray([3]))
    assert feat.shape == (1, TINY.d_embed)
    # feature must equal the end-token row times the projection
    row = np.asarray(emb)[0, 3]
    expect = row @ np.asarray(params["clip.text.text_proj"])
    np.testing.assert_allclose(np.asarray(feat)[0], expect, atol=1e-4)
