"""Stock-flash block-geometry sweep at the DiT attention shapes.

The shipped large-S dispatch (ops/stock_flash.py) picks (block_q,
block_k_major) by a fixed heuristic: bq = min(512, sq) and the largest
{1536,1024,512,256,128} divisor of the padded kv length.  That pick was
never swept — queue #23 adopted the stock kernel at its heuristic
geometry only.  This harness times the SHIPPED stock_flash path (q
promotion-padding + kv pad + segment ids included) under explicit
MLIS_STOCK_BLOCK overrides, carry-chained inside lax.scan so the kernel
cannot be hoisted (queue #22 lesson), with N=5 timed fetches reported as
min/med/max (queue #40 lesson: single numbers hide relay-state
outliers).

Shapes (b, h, S, d) — the four production DiT regimes:
  sd3-joint   (2, 24, 4250, 64)    sd35m-dual (2, 24, 4096, 64)
  sd35L-joint (2, 38, 4250, 64)    flux-1024  (1, 24, 4608, 128)

MLIS_SWEEP_SHAPE=name runs one shape (one queue entry per shape keeps
each under its own timeout); default runs all four.

Reference behavior anchor: softmax(QK^T/sqrt(d))V, src/ggml_extend.c:
200-222.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SHAPES = [("sd3-joint", 2, 24, 4250, 64),
          ("sd35m-dual", 2, 24, 4096, 64),
          ("sd35L-joint", 2, 38, 4250, 64),
          ("flux-1024", 1, 24, 4608, 128)]

N_RUNS = 5


def geometries(sk_pad: int, sq: int):
    """Candidate (bq, bkm) pairs: the heuristic default first, then the
    sweep grid (bkm must divide the padded kv length)."""
    bkms = [x for x in (1536, 1024, 768, 512, 256) if sk_pad % x == 0]
    default = (min(512, (sq // 128) * 128), bkms[0] if bkms else 128)
    cands = [default]
    for bq in (256, 512, 1024):
        for bkm in bkms:
            g = (bq, bkm)
            if g not in cands and bq <= sq:
                cands.append(g)
    return cands[:8]                     # compile budget per shape


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    from mlimgsynth_tpu.ops import stock_flash as sf

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    only = os.environ.get("MLIS_SWEEP_SHAPE", "")
    tiny = bool(os.environ.get("MLIS_SWEEP_TINY"))

    for name, b, h, s, d in SHAPES:
        if only and only != name:
            continue
        if tiny:    # CPU smoke: trace coverage only
            b, h, s, n_scan = 1, 2, 512, 2
            import functools as _ft
            import jax.experimental.pallas as pl
            pl.pallas_call = _ft.partial(pl.pallas_call, interpret=True)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        sk_pad = -(-s // sf._KV_PAD) * sf._KV_PAD
        print(f"--- {name} b{b} h{h} S{s} d{d} (kv pad {sk_pad})",
              flush=True)

        for bq, bkm in geometries(sk_pad, s):
            os.environ["MLIS_STOCK_BLOCK"] = f"{bq},{bkm}"   # trace-time read

            def loop(qc):
                def body(qc, _):
                    o = sf.stock_flash(qc, k, v)
                    return qc + o.astype(qc.dtype) * 1e-6, None
                qc, _ = jax.lax.scan(body, qc, None, length=n_scan)
                return jnp.mean(qc.astype(jnp.float32))
            label = f"{name} bq{bq} bkm{bkm}"
            try:
                fn = jax.jit(loop)
                t0 = time.time()
                np.asarray(fn(q))
                print(f"[{label}] compile+first {time.time() - t0:.1f}s",
                      flush=True)
                times = []
                for _ in range(N_RUNS):
                    t0 = time.time()
                    np.asarray(fn(q))
                    times.append((time.time() - t0) / n_scan * 1e3)
                print(f"RESULT {label}: min {min(times):.3f} "
                      f"med {statistics.median(times):.3f} "
                      f"max {max(times):.3f} ms/attention", flush=True)
            except Exception as e:  # noqa: BLE001 - record and continue
                print(f"RESULT {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
            finally:
                del os.environ["MLIS_STOCK_BLOCK"]


if __name__ == "__main__":
    main()
