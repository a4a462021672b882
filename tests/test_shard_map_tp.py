"""Explicit shard_map tensor parallelism vs the single-device block."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.parallel import mesh as pmesh
from mlimgsynth_tpu.parallel.shard_map_tp import (shard_transformer_params,
                                                  tp_basic_transformer)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

D_MODEL = 64
N_HEAD = 8
D_CTX = 32
PRE = "blk"


def _setup():
    def f(ctx, x, c):
        return B.basic_transformer(ctx, PRE, x, c, D_MODEL, D_MODEL, N_HEAD)

    x = jnp.zeros((2, 16, D_MODEL))
    c = jnp.zeros((2, 7, D_CTX))
    spec = B.trace_spec(f, x, c)
    rng = np.random.default_rng(0)
    params = {k: jnp.asarray(
        rng.standard_normal(s.shape).astype(np.float32) * 0.1)
        for k, s in spec.items()}
    rngx = np.random.default_rng(1)
    xv = jnp.asarray(rngx.standard_normal((2, 16, D_MODEL)).astype(np.float32))
    cv = jnp.asarray(rngx.standard_normal((2, 7, D_CTX)).astype(np.float32))
    return f, params, xv, cv


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_matches_single_device(tp):
    f, params, x, c = _setup()
    ctx = B.Ctx(params, dtype=jnp.float32)
    ref = np.asarray(f(ctx, x, c))

    mesh = pmesh.make_mesh(tp, tp=tp)
    sp = shard_transformer_params(params, PRE, mesh, N_HEAD)
    fwd = tp_basic_transformer(mesh, PRE, N_HEAD, D_MODEL)
    out = np.asarray(fwd(sp, x, c))
    np.testing.assert_allclose(out, ref, atol=1e-5)
