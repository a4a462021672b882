"""Attention ops: XLA reference path and Pallas flash-attention dispatch.

The reference computes full-softmax attention ``softmax(K^T Q / sqrt(d)) V``
(reference: src/ggml_extend.c:200-222) head-batched on a single device; its
flash-attention flag is disabled as broken.  Here the O(n^2) softmax is the
*fallback* and a fused Pallas TPU kernel (ops/flash_attention.py) is the hot
path, enabled whenever shapes allow.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_FLASH_ENV = "MLIS_FLASH_ATTENTION"

# Set by the session when a multi-chip mesh is active: Mosaic custom calls
# cannot be auto-partitioned by GSPMD, so sharded runs use the XLA softmax
# path (revisit with an explicit shard_map'ed kernel once >1 real chip is
# available).  Read at trace time; mesh-sharded inputs force a fresh trace
# (shardings are part of the jit cache key), so the flag takes effect.
FORCE_XLA = False


def use_flash() -> bool:
    if FORCE_XLA:
        return False
    v = os.environ.get(_FLASH_ENV, "auto")
    if v in ("0", "false", "no"):
        return False
    if v in ("1", "true", "yes"):
        return True
    return jax.default_backend() == "tpu"


def attention_xla(q, k, v, scale=None, causal=False):
    """Reference attention. q,k,v: [B, H, Sq|Sk, D]; returns [B, H, Sq, D].

    Logits and softmax accumulate in f32 regardless of input dtype.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def attention(q, k, v, scale=None, causal=False):
    """Dispatch to the Pallas flash kernel on TPU, XLA softmax otherwise."""
    if "attn" in os.environ.get("MLIS_ABLATE", ""):
        # perf-attribution mode (tools/step_bench.py): skip the softmax
        # attention itself, keep projections — NOT for real generation
        return jnp.broadcast_to(jnp.mean(v, axis=2, keepdims=True), q.shape[:3] + (v.shape[-1],))
    if use_flash():
        from .flash_attention import flash_attention_compatible, flash_attention
        if flash_attention_compatible(q, k, v, causal):
            return flash_attention(q, k, v, scale=scale, causal=causal)
    return attention_xla(q, k, v, scale=scale, causal=causal)
