"""Cross-round numeric regression pin.

The equivalence tests compare execution paths against EACH OTHER; this one
compares against a frozen snapshot so accidental numeric drift BETWEEN
build rounds (kernel rewrites, fusion changes, refactors) is caught even
when every path drifts together.  The golden was produced by the same
deterministic tiny checkpoint + prompt + seed on the f32 CPU path.

If a change intentionally alters numerics (e.g. a different reduction
order with documented error bounds), regenerate the snapshot with
tools-free one-liner in the golden file's git history and say so in the
commit message.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import patch_tiny_model_types, write_tiny_checkpoint
from mlimgsynth_tpu.api import MLImgSynth

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_tiny_sd1_latent.npz")


def test_latent_matches_golden_snapshot(tmp_path, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "g.safetensors"
    write_tiny_checkpoint(ckpt)
    s = MLImgSynth()
    s._dtype = jnp.float32
    for k, v in [("model", str(ckpt)), ("model-type", "sd1"),
                 ("image-dim", 64), ("steps", 3), ("seed", 42),
                 ("no-decode", 1),
                 ("prompt", "golden (regression:1.2) probe")]:
        s.option_set(k, v)
    lat = np.asarray(s.generate(), np.float32)
    ref = np.load(GOLDEN)["latent"]
    assert lat.shape == ref.shape
    # f32 CPU path: tolerance covers backend/jax-version reduction-order
    # jitter, not algorithmic drift
    np.testing.assert_allclose(lat, ref, atol=5e-4, rtol=1e-4)
