#!/usr/bin/env python3
"""A/B variant benchmark harness.

Compiles through the tunnel are minutes each, so perf experiments must be
batched: this runs a list of named code variants (each applied as a
monkeypatch before jitting one CFG-batched UNet step), times them with a
forced host fetch (block_until_ready is async through the tunnel), and
appends results to tools/ab_results.jsonl.

Add variants to VARIANTS below; run `python tools/ab_bench.py [sd15|sdxl]`.
Compile caches persist (~/.cache/mlimgsynth_tpu/xla), so re-runs are cheap.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "ab_results.jsonl")


def variant_baseline():
    yield


def variant_no_flash():
    os.environ["MLIS_FLASH_ATTENTION"] = "0"
    yield
    os.environ["MLIS_FLASH_ATTENTION"] = "auto"


def variant_groupnorm_bf16():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    orig = B.group_norm

    def gn(ctx, pre, x, n_grp=32, eps=1e-6, affine=True):
        dt = x.dtype
        n, h, w, c = x.shape
        xg = x.reshape(n, h * w, n_grp, c // n_grp)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(xg.astype(jnp.float32) - mean),
                       axis=(1, 3), keepdims=True)
        xg = (xg - mean.astype(dt)) * jax.lax.rsqrt(var + eps).astype(dt)
        xf = xg.reshape(n, h, w, c)
        if affine:
            wt = ctx.param(pre + ".weight", (c,), B.VEC, jnp.float32)
            b = ctx.param(pre + ".bias", (c,), B.VEC, jnp.float32)
            xf = xf * wt.astype(dt) + b.astype(dt)
        return xf

    B.group_norm = gn
    yield
    B.group_norm = orig


def variant_layernorm_bf16():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    orig = B.layer_norm

    def ln(ctx, pre, x, eps=1e-5, affine=True, bias=True):
        dt = x.dtype
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32) - mean), axis=-1,
                       keepdims=True)
        xf = (x - mean.astype(dt)) * jax.lax.rsqrt(var + eps).astype(dt)
        if affine:
            w = ctx.param(pre + ".weight", (x.shape[-1],), B.VEC,
                          jnp.float32)
            xf = xf * w.astype(dt)
            if bias:
                b = ctx.param(pre + ".bias", (x.shape[-1],), B.VEC,
                              jnp.float32)
                xf = xf + b.astype(dt)
        return xf

    B.layer_norm = ln
    yield
    B.layer_norm = orig


VARIANTS = {
    "baseline": variant_baseline,
    "no_flash": variant_no_flash,
    "groupnorm_bf16": variant_groupnorm_bf16,
    "layernorm_bf16": variant_layernorm_bf16,
}


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import unet as U
    from mlimgsynth_tpu.utils.compcache import enable
    from bench import synth_params
    enable()

    which = sys.argv[1] if len(sys.argv) > 1 else "sd15"
    unet_p = U.UNET_SDXL if which == "sdxl" else U.UNET_SD1
    lat = 128 if which == "sdxl" else 64
    label = (jnp.zeros((2, unet_p.ch_adm_in)) if unet_p.ch_adm_in else None)
    label1 = (jnp.zeros((1, unet_p.ch_adm_in)) if unet_p.ch_adm_in else None)

    spec = B.trace_spec(
        lambda ctx, x, t, c: U.unet_apply(ctx, x, t, c, label1, unet_p),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, unet_p.n_ctx)))
    params = synth_params(spec, 0)
    x = jnp.zeros((2, lat, lat, 4))
    c = jnp.zeros((2, 77, unet_p.n_ctx), jnp.bfloat16)

    for name, gen in VARIANTS.items():
        it = gen()
        next(it)  # enter
        try:
            @jax.jit
            def one(params, x, cond):
                ctx = B.Ctx(params, dtype=jnp.bfloat16)
                return U.denoise(ctx, x, jnp.float32(10.0),
                                 jnp.full((2,), 900.0), cond, label, unet_p)

            def run_once():
                r = one(params, x, c)
                np.asarray(r).ravel()[0]

            run_once()  # compile
            ts = []
            for _ in range(6):
                t0 = time.time()
                run_once()
                ts.append(time.time() - t0)
            result = {"config": which, "variant": name,
                      "ms": round(min(ts) * 1000, 2),
                      "ts": time.strftime("%Y-%m-%d %H:%M")}
            print(json.dumps(result), flush=True)
            with open(RESULTS, "a") as f:
                f.write(json.dumps(result) + "\n")
        finally:
            try:
                next(it)  # exit
            except StopIteration:
                pass


if __name__ == "__main__":
    main()
