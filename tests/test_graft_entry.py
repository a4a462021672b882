"""Keep the driver entry points (__graft_entry__.py) working."""
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_shapes():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 64, 64, 4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    ge.dryrun_multichip(8)
