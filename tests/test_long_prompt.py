"""A1111 long-prompt chunking: >75-token prompts split into 75-token CLIP
windows whose embeddings concatenate on the sequence axis; ``BREAK``
forces a window boundary.  (Beyond the reference, which errors past 75
tokens — src/clip.c:448-455.)"""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu import tokenizer as tok
from mlimgsynth_tpu.api import MLImgSynth
from helpers import (patch_tiny_model_types, write_tiny_checkpoint,
                     write_checkpoint_sdxl, TINY_MODEL_TYPE,
                     TINY_MODEL_TYPE_XL)


# ---------------------------------------------------------------------------
# tokenizer.split_windows
# ---------------------------------------------------------------------------

P = tok.CLIP_VIT_L_14


def test_split_single_window_matches_wrap():
    toks = list(range(1, 10))
    wins, wrows, fidx = tok.split_windows(P, toks, [0.5] * len(toks))
    assert len(wins) == 1
    assert wins[0] == tok.wrap_tokens(P, toks)
    assert fidx == len(toks) + 1
    assert wrows[0][0] == 1.0 and wrows[0][1:10] == [0.5] * 9
    assert wrows[0][10] == 1.0  # end token weight


def test_split_overflow_at_75():
    toks = list(range(1, 81))  # 80 tokens -> 75 + 5
    wins, wrows, fidx = tok.split_windows(P, toks)
    assert len(wins) == 2
    assert wins[0][1:76] == toks[:75]
    assert wins[0][76] == P.tok_end
    assert wins[1][1:6] == toks[75:]
    assert fidx == 76  # end token of the full first window


def test_split_break_sentinel():
    toks = [5, 6, tok.BREAK_TOKEN, 7]
    wins, wrows, fidx = tok.split_windows(P, toks, [1.0, 2.0, 1.0, 3.0])
    assert len(wins) == 2
    assert wins[0][1:3] == [5, 6] and wins[0][3] == P.tok_end
    assert wins[1][1] == 7
    assert wrows[0][1:3] == [1.0, 2.0]
    assert wrows[1][1] == 3.0
    assert fidx == 3


def test_split_pad_to_n_window():
    wins, wrows, fidx = tok.split_windows(P, [5], n_window=3)
    assert len(wins) == 3
    # empty pad windows are [start, end, pad...]
    assert wins[1][0] == P.tok_start and wins[1][1] == P.tok_end
    assert all(t == P.tok_pad for t in wins[2][2:])


# ---------------------------------------------------------------------------
# session paths
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


@pytest.fixture(scope="module")
def ckpt_xl(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_xl.safetensors"
    write_checkpoint_sdxl(path)
    return str(path)


def _session(ckpt, monkeypatch, **opts):
    patch_tiny_model_types(monkeypatch)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 2)
    s.option_set("seed", 42)
    for k, v in opts.items():
        s.option_set(k, v)
    return s


def test_encode_window_equivalence(ckpt, monkeypatch):
    """Each window encodes independently: the two-window embedding is the
    concat of the single-prompt embeddings."""
    from mlimgsynth_tpu import prompt as prompt_mod
    s = _session(ckpt, monkeypatch)
    s.setup()

    def enc(text):
        toks, _ = s._prompt_tokens(prompt_mod.prompt_set_parse(text))
        emb, _ = s._clip_encode(toks, None, "clip", False, True, 0)
        return emb

    long = enc("a cat BREAK a dog")
    a, b = enc("a cat"), enc("a dog")
    assert long.shape[1] == 154
    np.testing.assert_allclose(long[:, :77], a, atol=1e-6)
    np.testing.assert_allclose(long[:, 77:], b, atol=1e-6)


def test_long_prompt_generate_fused(ckpt, monkeypatch):
    s = _session(ckpt, monkeypatch)
    # 80 real tokens -> 2 natural windows, no BREAK
    s.option_set("prompt", "cat " * 80)
    img = s.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()


def test_fused_matches_stepwise(ckpt, monkeypatch):
    """The fused-encode loop path and the host-encode (step-observer)
    path agree on a BREAK prompt with emphasis weights."""
    s = _session(ckpt, monkeypatch)
    s.option_set("prompt", "a (cat:1.3) BREAK a [dog]")
    s.option_set("nprompt", "blurry")
    s.option_set("cfg-scale", 4.0)
    a = s.generate()
    s2 = _session(ckpt, monkeypatch)
    s2.option_set("prompt", "a (cat:1.3) BREAK a [dog]")
    s2.option_set("nprompt", "blurry")
    s2.option_set("cfg-scale", 4.0)
    s2.step_observer = lambda i, lat: None   # forces the non-fused path
    b = s2.generate()
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_uncond_padded_to_cond_windows(ckpt, monkeypatch):
    """Short negative prompt is padded with empty windows to the positive
    prompt's window count (cond/uncond must share a context length)."""
    s = _session(ckpt, monkeypatch)
    s.option_set("prompt", "cat BREAK dog BREAK bird")
    s.option_set("nprompt", "ugly")
    s.option_set("cfg-scale", 3.0)
    img = s.generate()
    assert np.isfinite(img).all()


def test_sdxl_long_prompt(ckpt_xl, monkeypatch):
    """Dual-tower fused path: both towers share the window split; the
    pooled feature comes from window 0."""
    patch_tiny_model_types(monkeypatch, {"sdxl": TINY_MODEL_TYPE_XL})
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt_xl)
    s.option_set("model-type", "sdxl")
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 2)
    s.option_set("seed", 7)
    s.option_set("cfg-scale", 3.0)
    s.option_set("prompt", "a cat BREAK a very large dog")
    img = s.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()


def test_single_window_unchanged(ckpt, monkeypatch):
    """W=1 prompts produce exactly the legacy [n,77] token layout (the
    golden regression pin depends on it)."""
    s = _session(ckpt, monkeypatch)
    s.setup()
    from mlimgsynth_tpu import prompt as prompt_mod
    pt = prompt_mod.prompt_set_parse("a cat")
    toks_rows, wmat = s._cond_token_rows([pt])
    assert toks_rows.shape == (1, 77)
    assert wmat.shape == (1, 77)
    raw_toks, _ = s._prompt_tokens(pt)
    assert list(toks_rows[0]) == tok.wrap_tokens(TINY_MODEL_TYPE.clip_p,
                                                 raw_toks)
