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


def test_break_dropped():
    pt = prompt_set_parse("normal BREAK normal")
    assert chunks(pt) == [("normal  normal", 1.0)]


def test_unmatched_raises():
    with pytest.raises(PromptParseError):
        prompt_set_parse("a dog) jumping")
    with pytest.raises(PromptParseError):
        prompt_set_parse("a <lora:x jumping")


def test_newline_escape():
    pt = prompt_set_parse("a\\nb")
    assert chunks(pt) == [("a\nb", 1.0)]
