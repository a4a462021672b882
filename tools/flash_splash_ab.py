"""Splash-attention A/B at the DiT self/joint-attention shapes.

jax.experimental.pallas.ops.tpu.splash_attention is the newer public
TPU attention kernel family (block-sparse mask skipping, head-minor or
seq-minor layouts).  The shipped stock-flash dispatch (ops/
stock_flash.py, queue #23) pads kv to a 512 multiple and masks the pad
via segment ids — the pad blocks still compute.  Splash consumes an
explicit mask whose fully-masked blocks are SKIPPED, so a rectangular
"kv < S" mask does no pad work at all; it may also simply schedule
better.  Carry-chained timing (queue #22 lesson: a loop-invariant call
gets hoisted; every variant chains on the scan carry).

Variants per shape:
  * stock+segids at the shipped auto geometry (adoption anchor)
  * splash NumpyMask(kv<S) at several (block_q, block_kv)
  * splash + SegmentIds (FullMask) — same masking strategy as stock
  * numerics: splash vs f32 softmax reference on a head slab

Shapes: sd3 joint (2,24,4250,64), sd35-medium dual (2,24,4096,64),
flux 1024px (1,24,4608,128).

Usage: python tools/flash_splash_ab.py [n_scan]
MLIS_SD3BENCH_TINY=1 runs a CPU-interpret smoke (trace coverage only).

Reference behavior anchor: softmax(QK^T/sqrt(d))V,
/root/reference/src/ggml_extend.c:200-222.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak, splash_attention_mask as sam)
    from mlimgsynth_tpu.ops import stock_flash

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    tiny = bool(os.environ.get("MLIS_SD3BENCH_TINY"))
    interpret = tiny and jax.default_backend() == "cpu"

    if tiny:
        shapes = [("tiny", 1, 2, 600, 64)]
        n_scan = 2
    else:
        shapes = [("sd3-joint", 2, 24, 4250, 64),
                  ("sd35m-dual", 2, 24, 4096, 64),
                  ("flux-1024", 1, 24, 4608, 128)]

    filt = os.environ.get("MLIS_SPLASH_FILTER", "")
    if filt:
        shapes = [s for s in shapes if any(f in s[0]
                                           for f in filt.split(","))]

    def bench(name, call, q):
        def loop(q):
            def body(qc, _):
                o = call(qc)
                return qc + o.astype(qc.dtype) * 1e-6, None
            qc, _ = jax.lax.scan(body, q, None, length=n_scan)
            return jnp.mean(qc.astype(jnp.float32))
        try:
            fn = jax.jit(loop)
            t0 = time.time()
            r = np.asarray(fn(q))
            if not np.isfinite(r):
                print(f"RESULT {name}: NONFINITE", flush=True)
                return
            print(f"[{name}] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(q))
                times.append(time.time() - t0)
            best = min(times) / n_scan
            print(f"RESULT {name}: {best * 1e3:.3f} ms/attention "
                  f"(x24 = {best * 24e3:.1f} ms/step-equiv)", flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    @functools.lru_cache(maxsize=None)
    def splash_kernel(h, sq_pad, skv_pad, s_valid, bq, bkv, use_segids):
        if use_segids:
            mask = sam.FullMask((sq_pad, skv_pad))
        else:
            m = np.zeros((sq_pad, skv_pad), dtype=np.bool_)
            m[:, :s_valid] = True          # all q rows see real kv only
            mask = sam.NumpyMask(m)
        mh = sam.MultiHeadMask([mask] * h)
        bs = sak.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=bkv)
        return sak.make_splash_mha(mh, block_sizes=bs, head_shards=1,
                                   q_seq_shards=1, interpret=interpret)

    for tag, b, h, s, d in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        scale = d ** -0.5

        # --- anchor: the shipped stock dispatch path ---
        if not tiny:
            bench(f"{tag}/stock-auto",
                  lambda qc, k=k, v=v: stock_flash.stock_flash(qc, k, v), q)

        # --- splash variants ---
        if tiny:
            grids = [(256, 256, False), (256, 256, True)]
        elif d == 128:
            grids = [(512, 512, False), (1024, 512, False),
                     (512, 1024, False), (2048, 512, False),
                     (512, 512, True)]
        else:
            grids = [(512, 512, False), (1024, 512, False),
                     (512, 1024, False), (1024, 1024, False),
                     (2048, 512, False), (256, 256, False),
                     (512, 512, True)]
        for bq, bkv, segids in grids:
            blk = max(bq, bkv)
            sp = -(-s // blk) * blk
            pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
            kern = splash_kernel(h, sp, sp, s, bq, bkv, segids)
            seg = None
            if segids:
                ids_kv = (jnp.arange(sp) >= s).astype(jnp.float32)
                seg = sak.SegmentIds(q=jnp.zeros((sp,), jnp.float32),
                                     kv=ids_kv)

            def call(qc, k=k, v=v, kern=kern, pad=pad, sp=sp, seg=seg):
                qp = jnp.pad(qc * scale, pad)
                kp, vp = jnp.pad(k, pad), jnp.pad(v, pad)
                if seg is not None:
                    o = jax.vmap(lambda a, b_, c: kern(a, b_, c, seg))(
                        qp, kp, vp)
                else:
                    o = jax.vmap(kern)(qp, kp, vp)
                return o[:, :, :s, :]
            nm = f"{tag}/splash-q{bq}kv{bkv}" + ("-segids" if segids else "")
            bench(nm, call, q)

        # --- numerics: splash NumpyMask vs f32 reference, head slab ---
        hs = min(h, 2)
        blk = 256 if tiny else 512
        sp = -(-s // blk) * blk
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        kern = splash_kernel(hs, sp, sp, s, blk, blk, False)

        @jax.jit
        def both(qs, ks, vs):
            o = jax.vmap(kern)(jnp.pad(qs * scale, pad), jnp.pad(ks, pad),
                               jnp.pad(vs, pad))[:, :, :s, :]
            sc = jnp.einsum("bhqd,bhkd->bhqk",
                            qs.astype(jnp.float32) * scale,
                            ks.astype(jnp.float32))
            p = jax.nn.softmax(sc, axis=-1)
            ref = jnp.einsum("bhqk,bhkd->bhqd", p, vs.astype(jnp.float32))
            return (jnp.max(jnp.abs(o.astype(jnp.float32) - ref)),
                    jnp.max(jnp.abs(ref)))
        try:
            diff, scl = (np.asarray(x)
                         for x in both(q[:, :hs], k[:, :hs], v[:, :hs]))
            ok = diff < 0.02 * max(float(scl), 1.0)
            print(f"RESULT {tag}/splash-numerics: max|diff|="
                  f"{float(diff):.5f} (ref scale {float(scl):.3f}) "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {tag}/splash-numerics: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
