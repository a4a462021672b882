"""Textual-inversion embeddings: <emb:NAME> prompt tags (additive
extension — the reference has no equivalent).  The learned vectors are
appended to the CLIP token table(s), so an embedding whose vectors equal a
real word's token rows must be float-EXACT equal to using that word."""
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from mlimgsynth_tpu import tokenizer as tok
from mlimgsynth_tpu.api import MLImgSynth, MlisError
from mlimgsynth_tpu.prompt import EMBED_MARK, prompt_set_parse
from helpers import (TINY_MODEL_TYPE, TINY_MODEL_TYPE_XL,
                     patch_tiny_model_types, write_checkpoint_sdxl,
                     write_tiny_checkpoint)


# ---------------------------------------------------------------------------
# prompt parsing
# ---------------------------------------------------------------------------

def test_parse_embed_tag():
    pt = prompt_set_parse("a <emb:foo> photo")
    assert pt.embeds == ["foo"]
    assert (EMBED_MARK + "foo", 1.0) in pt.chunks
    # position: between "a " and " photo"
    texts = [c for c, _ in pt.chunks]
    assert texts.index(EMBED_MARK + "foo") == texts.index("a ") + 1


def test_parse_embed_weights():
    # tag inside parens takes the emphasis weight in effect there
    pt = prompt_set_parse("(a <emb:foo>) b")
    w = dict(pt.chunks)[EMBED_MARK + "foo"]
    assert w == pytest.approx(1.1)
    # explicit (x:1.5) weight applies to the tag too
    pt = prompt_set_parse("(styled <emb:bar>:1.5) end")
    assert dict(pt.chunks)[EMBED_MARK + "bar"] == pytest.approx(1.5)
    # de-emphasis brackets
    pt = prompt_set_parse("[x <emb:d>] y")
    assert dict(pt.chunks)[EMBED_MARK + "d"] == pytest.approx(1 / 1.1)


def test_parse_embed_errors():
    with pytest.raises(Exception):
        prompt_set_parse("a <emb:> b")
    # unknown tags still rejected
    with pytest.raises(Exception):
        prompt_set_parse("a <unknown:x> b")


def test_parse_embedding_long_form():
    pt = prompt_set_parse("<embedding:myconcept>")
    assert pt.embeds == ["myconcept"]


# ---------------------------------------------------------------------------
# session integration
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def make_session(ckpt, monkeypatch, tmp_path, types=None, mt="sd1"):
    patch_tiny_model_types(monkeypatch, types)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", mt)
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 7)
    s.option_set("embed-dir", str(tmp_path))
    return s


def _word_rows(session, word, submodel="clip"):
    """Token-table rows of a word, straight from the loaded params."""
    ids = tok.tokenize(word)
    table = np.asarray(
        session._get_params(submodel)[f"{submodel}.text.embed.token.weight"],
        np.float32)
    return ids, table[np.asarray(ids)]


def test_embed_equals_word(ckpt, monkeypatch, tmp_path):
    """An embedding whose vector IS the table row of 'cat' must encode
    float-exactly like the literal word, at any emphasis weight."""
    s = make_session(ckpt, monkeypatch, tmp_path)
    s.setup()
    _, rows = _word_rows(s, "cat")
    assert rows.shape[0] == 1
    save_file({"emb_params": rows}, str(tmp_path / "likecat.safetensors"))

    s.option_set("prompt", "a <emb:likecat> photo")
    cond1, _ = s._text_cond_encode(s.prompt)
    s.option_set("prompt", "a cat photo")
    cond2, _ = s._text_cond_encode(s.prompt)
    np.testing.assert_array_equal(cond1, cond2)

    # emphasis weight applies to the spliced tokens like any other
    s.option_set("prompt", "a (<emb:likecat>:1.7) photo")
    cond1, _ = s._text_cond_encode(s.prompt)
    s.option_set("prompt", "a (cat:1.7) photo")
    cond2, _ = s._text_cond_encode(s.prompt)
    np.testing.assert_array_equal(cond1, cond2)


def test_embed_batch_path(ckpt, monkeypatch, tmp_path):
    """<emb:NAME> tags ride the batched serving path: a batch mixing an
    embedding prompt with its literal-word twin produces identical rows."""
    s = make_session(ckpt, monkeypatch, tmp_path)
    s.setup()
    _, rows = _word_rows(s, "cat")
    save_file({"emb_params": rows}, str(tmp_path / "likecat.safetensors"))
    imgs, _ = s.generate_batch(
        [{"prompt": "a <emb:likecat> photo", "seed": 5},
         {"prompt": "a cat photo", "seed": 5}])
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_embed_multivector_and_generate(ckpt, monkeypatch, tmp_path):
    """Multi-vector embedding == its multi-token phrase, end-to-end
    through generate() (registration happens after params were cached)."""
    s = make_session(ckpt, monkeypatch, tmp_path)
    s.option_set("prompt", "warmup")   # caches clip params pre-embedding
    s.generate()
    assert "clip" in s._params
    ids, rows = _word_rows(s, "big cat")
    assert rows.shape[0] == len(ids) >= 2
    save_file({"emb_params": rows}, str(tmp_path / "bigcat.safetensors"))

    s.option_set("prompt", "a <emb:bigcat> photo")
    s.option_set("seed", 7)
    img1 = s.generate()
    s.option_set("prompt", "a big cat photo")
    s.option_set("seed", 7)
    img2 = s.generate()
    np.testing.assert_array_equal(img1, img2)
    assert np.isfinite(img1).all()
    # and the conditioning itself is changed by the embedding tokens
    c1, _ = s._text_cond_encode(prompt_set_parse("a <emb:bigcat> photo"))
    c0, _ = s._text_cond_encode(prompt_set_parse("a photo"))
    assert np.abs(c1 - c0).max() > 0


def test_embed_pt_format(ckpt, monkeypatch, tmp_path):
    import torch
    s = make_session(ckpt, monkeypatch, tmp_path)
    s.setup()
    _, rows = _word_rows(s, "dog")
    torch.save({"string_to_param": {"*": torch.from_numpy(rows)}},
               str(tmp_path / "ptdog.pt"))
    s.option_set("prompt", "<emb:ptdog> runs")
    cond1, _ = s._text_cond_encode(s.prompt)
    s.option_set("prompt", "dog runs")
    cond2, _ = s._text_cond_encode(s.prompt)
    np.testing.assert_array_equal(cond1, cond2)


def test_embed_errors(ckpt, monkeypatch, tmp_path):
    s = make_session(ckpt, monkeypatch, tmp_path)
    s.option_set("prompt", "<emb:nosuchfile>")
    with pytest.raises(MlisError) as ei:
        s.generate()
    assert ei.value.code == MlisError.E_FILE_NOT_FOUND
    # wrong embedding width
    save_file({"emb_params": np.zeros((1, 16), np.float32)},
              str(tmp_path / "narrow.safetensors"))
    s.option_set("prompt", "<emb:narrow>")
    with pytest.raises(MlisError, match="width"):
        s.generate()


def test_embed_sdxl_dual_tables(tmp_path, monkeypatch):
    """SDXL embeddings carry clip_l + clip_g tables; both towers splice
    their own vectors — verified by the word-equality trick on the fused
    dual-encoder conditioning (cond AND label must match)."""
    ckpt = tmp_path / "sdxl.safetensors"
    write_checkpoint_sdxl(ckpt)
    s = make_session(ckpt, monkeypatch, tmp_path,
                     types={"sdxl": TINY_MODEL_TYPE_XL}, mt="sdxl")
    s.setup()
    _, rows_l = _word_rows(s, "cat", "clip")
    _, rows_g = _word_rows(s, "cat", "clip2")
    save_file({"clip_l": rows_l, "clip_g": rows_g},
              str(tmp_path / "xcat.safetensors"))
    s.option_set("prompt", "a <emb:xcat> photo")
    cond1, label1 = s._text_cond_encode(s.prompt)
    s.option_set("prompt", "a cat photo")
    cond2, label2 = s._text_cond_encode(s.prompt)
    np.testing.assert_array_equal(cond1, cond2)
    np.testing.assert_array_equal(label1, label2)
    # an SD1-style single-table embedding must be rejected on SDXL
    save_file({"emb_params": rows_l}, str(tmp_path / "sd1only.safetensors"))
    s.option_set("prompt", "<emb:sd1only>")
    with pytest.raises(MlisError, match="no table"):
        s._text_cond_encode(s.prompt)
