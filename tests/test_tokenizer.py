# Golden token vectors from the reference tokenizer test
# (reference: src/test_text_tokenize_clip.c:35-71).
import pytest

from mlimgsynth_tpu import tokenizer as tok

CASES = [
    ("a dog jumping", [320, 1929, 11476]),
    ("   a   dog\t\tjumping\r\n", [320, 1929, 11476]),
    ("an illustration", [550, 6052]),
    ('a sign saying "Here lies Cesar"',
     [320, 2292, 4455, 257, 763, 3205, 28603, 257]),
    ("a sign saying 'Here lies Cesar'",
     [320, 2292, 4455, 262, 763, 3205, 28603, 262]),
    ("2025", [17, 15, 17, 276]),
    ("A'veA'llA's", [320, 1200, 320, 1342, 320, 568]),
    ("", []),
    ("  \t  \n", []),
    ("a dog, a house.", [320, 1929, 267, 320, 1212, 269]),
    ("coraz\xf3n", [851, 854, 13926]),
    ("cat---dog-—-rabbit", [2368, 11079, 1929, 12, 6718, 268, 10274]),
    ("まあ、お待ちなさい。",
     [4813, 122, 4813, 480, 45262, 4813, 232, 161, 122, 227, 4813, 94,
      29104, 4813, 243, 38850, 38000]),
    ("Stable Diffusion is a deep learning, text-to-image model released in "
     "2022 based on diffusion techniques.",
     [10492, 18656, 9364, 533, 320, 3383, 2378, 267, 4160, 268, 531, 268,
      2867, 2863, 3410, 530, 17, 15, 17, 273, 2812, 525, 18656, 9364, 1782,
      697, 7715, 269]),
]


@pytest.mark.parametrize("text,expected", CASES, ids=range(len(CASES)))
def test_tokenize_golden(text, expected):
    assert tok.tokenize(text) == expected


def test_wrap_tokens_sd1():
    p = tok.CLIP_VIT_L_14
    toks = tok.tokenize("a dog jumping")
    wrapped = tok.wrap_tokens(p, toks)
    assert len(wrapped) == 77
    assert wrapped[0] == 49406
    assert wrapped[1:4] == [320, 1929, 11476]
    assert wrapped[4] == 49407
    assert all(t == 49407 for t in wrapped[5:])


def test_wrap_tokens_pad_zero():
    p = tok.CLIP_VIT_H_14
    wrapped = tok.wrap_tokens(p, [100])
    assert wrapped[:3] == [49406, 100, 49407]
    assert all(t == 0 for t in wrapped[3:])


def test_too_long_raises():
    with pytest.raises(ValueError):
        tok.wrap_tokens(tok.CLIP_VIT_L_14, list(range(100)))


def test_token_decode_roundtrip():
    for text in ("hello world", "a dog jumping"):
        toks = tok.tokenize(text)
        s = "".join(tok.token_str(t) for t in toks)
        assert s.replace(" ", "") == text.replace(" ", "")
