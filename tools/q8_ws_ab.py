"""Weight-stationary dq-kernel A/B at the DiT linear shapes.

The default q8/q4 grid (m, n, k) re-streams the full weight matrix once
per m-block: at sd35-large shapes (M=8500 joint tokens, bm=256) every
weight byte crosses HBM ~34x per call and the in-VMEM dequant VPU work
multiplies the same way.  The ws variants (q8_matmul_ws/q4_matmul_ws)
run grid (n, m) with the full-K stripe resident, reading weights once.

Carry-chained scan timing (queue #22 lesson).  Reports ms/call and the
implied effective weight-bandwidth for context.

REPEAT/VARIANCE reporting (round-5, after the queue-36/38/39 ws@flux-dn
bimodality: 3.54 / 7.20 / 9.91 ms at the same shape): each entry runs
N_TIME timed executions and prints min / median / max.  Set
MLIS_WS_COMPILES=C (C > 1) to probe COMPILE-time instability — the
entry is compiled C times from scratch (persistent compile cache
disabled for the process) and the per-compile minima are reported, so
Mosaic scheduling nondeterminism separates from run-to-run noise.

MLIS_WS_GEOM=bm:bn[,bm:bn...]: additionally bench q8-ws at the given
explicit geometries (planner-override A/B; planner v1 vs v2 picked
different (bm, bn) at flux-dn, which is part of the bimodality).

Shapes: the four sd35-large linears (d=2432, M=8500 CFG joint tokens)
and the three flux linears (d=3072, M=4608).

Usage: python tools/q8_ws_ab.py [n_scan]
MLIS_SD3BENCH_TINY=1: CPU-interpret smoke.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    n_compiles = max(1, int(os.environ.get("MLIS_WS_COMPILES", "1")))
    if n_compiles == 1:
        # fresh-compile probing needs real recompiles; otherwise the
        # persistent cache makes warm A/B turnaround bearable
        from mlimgsynth_tpu.utils.compcache import enable as _cc
        _cc()
    from mlimgsynth_tpu.ops import q4_matmul as q4
    from mlimgsynth_tpu.ops import q8_matmul as q8

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    tiny = bool(os.environ.get("MLIS_SD3BENCH_TINY"))
    if tiny:
        n_scan = 2
        if jax.default_backend() == "cpu":
            import functools as _ft
            q8.pl.pallas_call = _ft.partial(q8.pl.pallas_call,
                                            interpret=True)
            q4.pl.pallas_call = _ft.partial(q4.pl.pallas_call,
                                            interpret=True)
        shapes = [("tiny", 130, 256, 512)]
    else:
        shapes = [
            ("sd35L-qkv", 8500, 2432, 7296),
            ("sd35L-out", 8500, 2432, 2432),
            ("sd35L-mlp-up", 8500, 2432, 9728),
            ("sd35L-mlp-dn", 8500, 9728, 2432),
            ("flux-qkv", 4608, 3072, 9216),
            ("flux-mlp-up", 4608, 3072, 12288),
            ("flux-mlp-dn", 4608, 12288, 3072),
        ]

    n_time = 5 if not tiny else 2

    def bench(name, call, x, w_bytes):
        def loop(x):
            def body(xc, _):
                o = call(xc)
                # chain on a reduction of the FULL output (no hoist/DCE)
                return xc + jnp.mean(o, axis=1, keepdims=True) * 1e-6, None
            xc, _ = jax.lax.scan(body, x, None, length=n_scan)
            return jnp.mean(xc.astype(jnp.float32))
        try:
            samples = []          # all timed runs, every compile
            per_compile = []      # min per compile
            for ci in range(n_compiles):
                fn = jax.jit(loop)
                t0 = time.time()
                r = np.asarray(fn(x))
                if not np.isfinite(r):
                    print(f"RESULT {name}: NONFINITE", flush=True)
                    return
                if ci == 0:
                    print(f"[{name}] compile+first {time.time() - t0:.1f}s",
                          flush=True)
                times = []
                for _ in range(n_time):
                    t0 = time.time()
                    np.asarray(fn(x))
                    times.append((time.time() - t0) / n_scan)
                samples.extend(times)
                per_compile.append(min(times))
                if n_compiles > 1:
                    fn.clear_cache()
                    jax.clear_caches()
            samples.sort()
            best = samples[0]
            med = samples[len(samples) // 2]
            worst = samples[-1]
            bw = w_bytes / best / 1e9
            extra = ""
            if n_compiles > 1:
                pc = " ".join(f"{v * 1e3:.3f}" for v in per_compile)
                extra = f" per-compile-min=[{pc}]"
            print(f"RESULT {name}: {best * 1e3:.3f} ms/call "
                  f"med={med * 1e3:.3f} max={worst * 1e3:.3f} "
                  f"n={len(samples)} "
                  f"(weights-once BW {bw:.0f} GB/s-equiv){extra}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    filt = os.environ.get("MLIS_WS_FILTER", "")
    if filt:
        shapes = [s for s in shapes if any(f in s[0]
                                           for f in filt.split(","))]
    for tag, m, k, n in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16) * 0.3
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        qw, s = q8.quantize_weight(w)
        qd, sd = jnp.asarray(qw), jnp.asarray(s)
        bench(f"{tag}/q8-default",
              lambda xc, qd=qd, sd=sd: q8.q8_matmul(xc, qd, sd), x, k * n)
        bench(f"{tag}/q8-ws",
              lambda xc, qd=qd, sd=sd: q8.q8_matmul_ws(xc, qd, sd), x, k * n)
        rsp = q8._plan_rs(m, k, n, 2, 2)
        if rsp is not None:
            bm_rs, kb_rs = rsp[0], rsp[1]
            bench(f"{tag}/q8-rs(bm{bm_rs},kb{kb_rs})",
                  lambda xc, qd=qd, sd=sd, bm=bm_rs, kb=kb_rs:
                  q8.q8_matmul(xc, qd, sd, block_m=bm, block_n=n,
                               block_k=kb), x, k * n)
        for gspec in filter(None,
                            os.environ.get("MLIS_WS_GEOM", "").split(",")):
            bm_g, bn_g = (int(v) for v in gspec.split(":"))
            bench(f"{tag}/q8-ws(bm{bm_g},bn{bn_g})",
                  lambda xc, qd=qd, sd=sd, bm=bm_g, bn=bn_g:
                  q8.q8_matmul_ws(xc, qd, sd, block_m=bm, block_n=bn),
                  x, k * n)
        qc, sc = q8.quantize_weight_percol(w)
        qcd, scd = jnp.asarray(qc), jnp.asarray(sc)
        bench(f"{tag}/q8-ws-int8",
              lambda xc, qcd=qcd, scd=scd: q8.q8_matmul_ws_int8(
                  xc, qcd, scd), x, k * n)
        # shipping dispatch under current env defaults: per-block pair
        # (ws/rs cost model) and per-column pair (int8ws candidacy)
        bench(f"{tag}/q8-dot",
              lambda xc, qd=qd, sd=sd: q8.q8_dot(xc, qd, sd), x, k * n)
        if q8.percol_eligible(k, n, m_hint=m):
            bench(f"{tag}/q8-dot-percol",
                  lambda xc, qcd=qcd, scd=scd: q8.q8_dot(xc, qcd, scd),
                  x, k * n)
        p, s4 = q4.quantize_weight_q4(w)
        pd, s4d = jnp.asarray(p), jnp.asarray(s4)
        bench(f"{tag}/q4-default",
              lambda xc, pd=pd, s4d=s4d: q4.q4_matmul(xc, pd, s4d),
              x, k * n // 2)
        bench(f"{tag}/q4-ws",
              lambda xc, pd=pd, s4d=s4d: q4.q4_matmul_ws(xc, pd, s4d),
              x, k * n // 2)
        rsp4 = q8._plan_rs(m, k, n, 2, 2, w_bytes=0.5,
                           temp_bytes=q4._Q4_TEMP_BYTES)
        if rsp4 is not None:
            bm4, kb4 = rsp4[0], rsp4[1]
            bench(f"{tag}/q4-rs(bm{bm4},kb{kb4})",
                  lambda xc, pd=pd, s4d=s4d, bm=bm4, kb=kb4:
                  q4.q4_matmul(xc, pd, s4d, block_m=bm, block_n=n,
                               block_k=kb), x, k * n // 2)
        del qd, sd, pd, s4d, qcd, scd

    # numerics on device: ws vs default at one shape
    tag, m, k, n = shapes[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16) * 0.3
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qw, s = q8.quantize_weight(w)
    qd, sd = jnp.asarray(qw), jnp.asarray(s)

    @jax.jit
    def diff(x):
        a = q8.q8_matmul(x, qd, sd).astype(jnp.float32)
        b = q8.q8_matmul_ws(x, qd, sd).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))
    try:
        d, scl = (float(np.asarray(v)) for v in diff(x))
        ok = d < 0.02 * max(scl, 1.0)
        print(f"RESULT ws-numerics: max|diff|={d:.5f} (scale {scl:.3f}) "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"RESULT ws-numerics: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    rsp = q8._plan_rs(m, k, n, 2, 2)
    if rsp is not None:
        bm_rs, kb_rs = rsp[0], rsp[1]

        @jax.jit
        def diff_rs(x):
            a = q8.q8_matmul(x, qd, sd).astype(jnp.float32)
            b = q8.q8_matmul(x, qd, sd, block_m=bm_rs, block_n=n,
                             block_k=kb_rs).astype(jnp.float32)
            return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(a))
        try:
            d, scl = (float(np.asarray(v)) for v in diff_rs(x))
            ok = d < 0.02 * max(scl, 1.0)
            print(f"RESULT rs-numerics: max|diff|={d:.5f} "
                  f"(scale {scl:.3f}) {'PASS' if ok else 'FAIL'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT rs-numerics: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
