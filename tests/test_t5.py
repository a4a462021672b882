"""T5 v1.1 encoder parity vs HuggingFace transformers T5EncoderModel.

transformers is an independent implementation of the T5 math (RMSNorm,
unscaled attention, relative-position buckets, gated-gelu FFN); weights are
shared through the HF state dict (checkpoint layout) and routed through the
loader's transforms on the JAX side."""
import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import t5 as t5_mod
from mlimgsynth_tpu.weights import _to_layout

TINY_T5 = t5_mod.T5Params(d_model=32, d_kv=8, n_head=4, d_ff=37, n_layer=2,
                          n_vocab=120)


def _hf_model():
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(
        vocab_size=TINY_T5.n_vocab, d_model=TINY_T5.d_model,
        d_kv=TINY_T5.d_kv, num_heads=TINY_T5.n_head, d_ff=TINY_T5.d_ff,
        num_layers=TINY_T5.n_layer, feed_forward_proj="gated-gelu",
        relative_attention_num_buckets=TINY_T5.rel_buckets,
        relative_attention_max_distance=TINY_T5.rel_max_dist,
        dropout_rate=0.0)
    torch.manual_seed(0)
    m = T5EncoderModel(cfg)
    m.eval()
    return m


def _params_from_hf(m):
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    spec = B.trace_spec(
        lambda ctx, toks: t5_mod.t5_encode_apply(ctx, toks, TINY_T5),
        jnp.zeros((1, 9), jnp.int32))
    params = {}
    for name, ps in spec.items():
        arr = sd[name[len("t5."):]]
        params[name] = jnp.asarray(_to_layout(arr.copy(), ps, name))
    return spec, params


def test_t5_matches_transformers():
    m = _hf_model()
    spec, params = _params_from_hf(m)
    rng = np.random.default_rng(0)
    toks = rng.integers(2, TINY_T5.n_vocab, (2, 9)).astype(np.int32)
    ctx = B.Ctx(params, dtype=jnp.float32)
    got = np.asarray(t5_mod.t5_encode_apply(ctx, jnp.asarray(toks), TINY_T5),
                     np.float32)
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(toks.astype(np.int64))
                ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, ref, atol=3e-4,
                               err_msg="T5 encoder mismatch vs transformers")


def test_t5_geometry_inference():
    m = _hf_model()
    sd = m.state_dict()
    shapes = {"t5." + k: tuple(v.shape) for k, v in sd.items()}
    P = t5_mod.params_from_spec_shapes(shapes)
    assert P.d_model == TINY_T5.d_model
    assert P.d_kv == TINY_T5.d_kv
    assert P.n_head == TINY_T5.n_head
    assert P.d_ff == TINY_T5.d_ff
    assert P.n_layer == TINY_T5.n_layer
    assert P.n_vocab == TINY_T5.n_vocab


def test_rel_bucket_matches_transformers():
    from transformers.models.t5.modeling_t5 import T5Attention
    s = 23
    want = T5Attention._relative_position_bucket(
        torch.arange(s)[None, :] - torch.arange(s)[:, None],
        bidirectional=True, num_buckets=32, max_distance=128).numpy()
    got = t5_mod.rel_bias_indices(s)
    np.testing.assert_array_equal(got, want)


def _write_word_tokenizer(path):
    """Minimal HF-tokenizers WordLevel tokenizer for tests."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2,
             "a": 3, "cat": 4, "dog": 5, "photo": 6, "of": 7}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path))
    return vocab


def test_tokenize_pad_eos(tmp_path):
    p = tmp_path / "tok.json"
    _write_word_tokenizer(p)
    out = t5_mod.tokenize(["a photo of a cat", "dog"], n_token=8,
                          tokenizer_json=str(p))
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(out[0], [3, 6, 7, 3, 4, 1, 0, 0])
    np.testing.assert_array_equal(out[1], [5, 1, 0, 0, 0, 0, 0, 0])
    with pytest.raises(ValueError):
        t5_mod.tokenize(["x"], 8, None)


def test_t5_quantized_pairs():
    """T5 linears route through blocks.linear so int8 weight-only pairs
    dispatch (the sd3-t5 bench synthesizes T5-XXL int8 on device);
    quantized forward approximates the plain one."""
    import io as _io
    from mlimgsynth_tpu.io import gquant

    P = t5_mod.T5Params(d_model=128, d_kv=32, n_head=4, d_ff=256,
                        n_layer=2, n_vocab=512)
    spec = B.trace_spec(
        lambda ctx, toks: t5_mod.t5_encode_apply(ctx, toks, P),
        jnp.zeros((1, 9), jnp.int32))
    rng = np.random.default_rng(3)
    plain = {k: jnp.asarray((rng.standard_normal(ps.shape) * 0.05)
                            .astype(np.float32))
             for k, ps in spec.items()}
    qp = {}
    for k, ps in spec.items():
        a = np.asarray(plain[k])
        if getattr(ps, "kind", None) == B.LINEAR_W and a.ndim == 2 \
                and a.shape[0] % 128 == 0:
            kb = a.reshape(a.shape[0] // 128, 128, a.shape[1])
            sc = np.abs(kb).max(axis=1) / 127.0
            q = np.clip(np.round(kb / sc[:, None, :]), -127, 127)
            qp[k + "_q8"] = jnp.asarray(q.astype(np.int8)
                                        .reshape(a.shape))
            qp[k + "_scale"] = jnp.asarray(sc.astype(np.float32))
        else:
            qp[k] = plain[k]
    toks = rng.integers(2, P.n_vocab, (1, 9)).astype(np.int32)
    full = np.asarray(t5_mod.t5_encode_apply(
        B.Ctx(plain, dtype=jnp.float32), jnp.asarray(toks), P))
    got = np.asarray(t5_mod.t5_encode_apply(
        B.Ctx(qp, dtype=jnp.float32), jnp.asarray(toks), P))
    assert np.isfinite(got).all()
    # int8 weight-only: small relative error vs the f32 forward
    rel = np.abs(got - full).max() / max(np.abs(full).max(), 1e-6)
    assert rel < 0.05, rel
