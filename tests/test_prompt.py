# Golden cases from the reference prompt-preproc test
# (reference: src/test_prompt_preproc.c:99-130).
import pytest

from mlimgsynth_tpu.prompt import (PromptParseError, prompt_set_parse,
                                   prompt_set_raw)


def chunks(pt):
    return [(t, pytest.approx(w)) for t, w in pt.chunks]


def test_raw():
    text = "a (dog:1.5) jumping [in] the ((park))"
    pt = prompt_set_raw(text)
    assert pt.chunks == [(text, 1.0)]
    assert pt.loras == []


def test_simple():
    pt = prompt_set_parse("a dog jumping")
    assert chunks(pt) == [("a dog jumping", 1.0)]


def test_paren_emphasis():
    pt = prompt_set_parse("a (dog) jumping")
    assert chunks(pt) == [("a ", 1.0), ("dog", 1.1), (" jumping", 1.0)]


def test_bracket_emphasis():
    pt = prompt_set_parse("a [dog] jumping")
    assert chunks(pt) == [("a ", 1.0), ("dog", 1 / 1.1), (" jumping", 1.0)]


def test_double_paren():
    pt = prompt_set_parse("a ((dog)) jumping")
    assert chunks(pt) == [("a ", 1.0), ("dog", 1.1 * 1.1), (" jumping", 1.0)]


def test_explicit_weight():
    pt = prompt_set_parse("a (dog:1.5) jumping")
    assert chunks(pt) == [("a ", 1.0), ("dog", 1.5), (" jumping", 1.0)]


def test_lora_default_mult():
    pt = prompt_set_parse("a dog jum<lora:LORA NAME>ping")
    assert chunks(pt) == [("a dog jumping", 1.0)]
    assert pt.loras == [("LORA NAME", 1.0)]


def test_lora_mult():
    pt = prompt_set_parse("a dog jum<lora:LORA NAME:0.8>ping")
    assert chunks(pt) == [("a dog jumping", 1.0)]
    assert pt.loras == [("LORA NAME", pytest.approx(0.8))]


def test_escapes():
    pt = prompt_set_parse("a \\(dog\\) jumping")
    assert chunks(pt) == [("a (dog) jumping", 1.0)]


def test_escaped_lora():
    pt = prompt_set_parse("a dog jum\\<lora:LORA NAME>ping")
    assert chunks(pt) == [("a dog jum<lora:LORA NAME>ping", 1.0)]
    assert pt.loras == []


def test_break_marker():
    # BREAK becomes a window-break marker chunk (A1111 chunking); the
    # text around it is unchanged
    from mlimgsynth_tpu.prompt import BREAK_MARK
    pt = prompt_set_parse("normal BREAK normal")
    assert pt.text == "normal  normal"
    assert chunks(pt) == [("normal ", 1.0), (BREAK_MARK, 1.0),
                          (" normal", 1.0)]


def test_unmatched_raises():
    with pytest.raises(PromptParseError):
        prompt_set_parse("a dog) jumping")
    with pytest.raises(PromptParseError):
        prompt_set_parse("a <lora:x jumping")


def test_newline_escape():
    pt = prompt_set_parse("a\\nb")
    assert chunks(pt) == [("a\nb", 1.0)]


# -- prompt editing / alternation -------------------------------------------

def test_editing_switch():
    from mlimgsynth_tpu.prompt import editing_segments, expand_editing
    texts, idx = editing_segments("a [cat:dog:3] photo", 6)
    assert texts == ["a cat photo", "a dog photo"]
    assert idx == [0, 0, 0, 1, 1, 1]
    # fraction boundary
    texts, idx = editing_segments("a [cat:dog:0.5] photo", 4)
    assert texts == ["a cat photo", "a dog photo"]
    assert idx == [0, 0, 1, 1]
    # add-after and remove-after forms
    t, _ = expand_editing("x [extra:2]", 1, 4)
    assert t == "x "
    t, _ = expand_editing("x [extra:2]", 2, 4)
    assert t == "x extra"
    t, _ = expand_editing("x [gone::2]", 1, 4)
    assert t == "x gone"
    t, _ = expand_editing("x [gone::2]", 3, 4)
    assert t == "x "


def test_editing_alternation_and_nesting():
    from mlimgsynth_tpu.prompt import editing_segments
    texts, idx = editing_segments("[a|b] q", 4)
    assert texts == ["a q", "b q"]
    assert idx == [0, 1, 0, 1]
    # nested editing inside an emphasis bracket
    texts, idx = editing_segments("[[red:blue:2] car]", 4)
    assert texts == ["[red car]", "[blue car]"]
    assert idx == [0, 0, 1, 1]


def test_editing_no_constructs():
    from mlimgsynth_tpu.prompt import editing_segments
    assert editing_segments("plain [emphasis] (x:1.3)", 8) is None
    assert editing_segments("tag <lora:style:0.8> ok", 8) is None


def test_editing_escapes():
    from mlimgsynth_tpu.prompt import editing_segments
    assert editing_segments(r"literal \[a:b:2\]", 4) is None
