#!/usr/bin/env python3
"""Regenerate mlimgsynth_tpu/data/clip_merges.npy.

The table lists CLIP's 48,894 BPE merge pairs as (left, right) token ids in
merge-priority order (ids: 0-255 byte tokens, 256-511 end-of-word bytes,
512+ earlier merges).  Two sources are supported:

* OpenAI's ``bpe_simple_vocab_16e6.txt.gz`` (the original vocabulary used by
  CLIP's simple_tokenizer; reference: gencode_clip_merges.py),
* an existing C table file with ``{left, right},`` rows.

Usage:
  python tools/gen_clip_merges.py bpe_simple_vocab_16e6.txt.gz
  python tools/gen_clip_merges.py clip_merges.c.h
"""
import gzip
import os
import re
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "mlimgsynth_tpu", "data", "clip_merges.npy")

# byte <-> unicode printable mapping used by the OpenAI vocab file
# (GPT-2 style bytes_to_unicode)


def bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(ord("\xa1"), ord("\xac") + 1)) + \
        list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def byte_to_token(b: int) -> int:
    if b <= 32:
        return b + 188
    if b <= 126:
        return b - 33
    if b <= 160:
        return b + 94
    if b <= 172:
        return b - 67
    if b == 173:
        return 255
    return b - 68


def from_vocab_gz(path: str) -> np.ndarray:
    u2b = {v: k for k, v in bytes_to_unicode().items()}
    with gzip.open(path, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    merges = lines[1:49152 - 256 - 2 + 1]  # same slice CLIP uses

    def word_token(word: str, eow: bool) -> int:
        """Token id of a fully-merged unit (single byte or earlier merge)."""
        key = (word, eow)
        tid = table.get(key)
        if tid is not None:
            return tid
        if len(word) == 1:
            b = u2b[word]
            return byte_to_token(b) + (256 if eow else 0)
        raise KeyError(key)

    table = {}
    pairs = []
    for i, line in enumerate(merges):
        a, b = line.split()
        eow_b = b.endswith("</w>")
        if eow_b:
            b = b[:-4]
        left = word_token(a, False)
        right = word_token(b, eow_b)
        pairs.append((left, right))
        table[(a + b, eow_b)] = 512 + i
    return np.asarray(pairs, np.int32)


def from_c_table(path: str) -> np.ndarray:
    pairs = []
    for line in open(path):
        m = re.match(r"\{(-?\d+),\s*(-?\d+)\}", line.strip())
        if m:
            pairs.append((int(m.group(1)), int(m.group(2))))
    return np.asarray(pairs, np.int32)


def main():
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    path = sys.argv[1]
    if path.endswith(".gz"):
        arr = from_vocab_gz(path)
    else:
        arr = from_c_table(path)
    assert arr.shape[1] == 2 and len(arr) > 40000, arr.shape
    np.save(OUT, arr)
    print(f"wrote {OUT}: {arr.shape[0]} merge pairs")


if __name__ == "__main__":
    main()
