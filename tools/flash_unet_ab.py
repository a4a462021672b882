"""UNet-regime attention kernel A/B: ours-t vs stock-natural, NO relayout.

VERDICT r4 weak #5: our transposed-v kernel runs ~15% MFU at DiT shapes
and the stock kernel's grid beat it there by ~40% — but at UNet shapes
the only stock measurement included a [S,d]<->[d,S] relayout around the
call (BENCH queue #25: ours-t 7.4/9.2 ms vs stock 10.0/12.3 INCLUDING
relayout).  The layout change is free when folded into the projection
einsums (attn_mhead already does exactly that for ours-t), so the
decision-relevant number is stock KERNEL-ONLY at the UNet shapes.  This
harness measures that, carry-chained inside lax.scan (queue #21's
hoisting lesson) with scalar fetches, N=5 timed runs, min/med/max.

Shapes are the flash-eligible self-attention sites of the shipped UNets
(batch 2 = CFG; S >= 512 is the flash gate, smaller goes XLA):

  sd15-L0  (2, 8, 4096,  40)   sd15-L1  (2, 8, 1024,  80)
  sdxl-L1  (2,10, 4096,  64)   sdxl-L2  (2,20, 1024,  64)
  sd21-L0  (2, 5, 9216,  64)   sd21-L1  (2,10, 2304,  64)

Variants per shape:
  * ours-t planner default (the shipped path)
  * ours-t explicit block geometries
  * stock kernel, natural layout, several (block_q, block_k_major)
    (segment-ids masking added automatically when kv needs padding)
  * xla-softmax anchor

In-loop promotion safety at these shapes: outputs are bf16 2.6-11.8 MiB
(promotion window), but stock's kernel frame at bq<=512/bkm<=1024 is
~3 MiB, so frame+output stays under the 15 MiB budget (regime (a) of
ops/flash_attention._plan_flash).  The numerics check runs stock (with
segids when padded) vs f32 XLA softmax on the real rows.

Env: MLIS_UNET_AB_TINY=1 (CPU smoke), MLIS_UNET_AB_FILTER=substr,
MLIS_UNET_AB_SCAN=N (default 20).

Usage: python tools/flash_unet_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SHAPES = [
    ("sd15-L0", 2, 8, 4096, 40),
    ("sd15-L1", 2, 8, 1024, 80),
    ("sdxl-L1", 2, 10, 4096, 64),
    ("sdxl-L2", 2, 20, 1024, 64),
    ("sd21-L0", 2, 5, 9216, 64),
    ("sd21-L1", 2, 10, 2304, 64),
]


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    from mlimgsynth_tpu.ops import flash_attention as fa
    from mlimgsynth_tpu.ops.attention import attention_xla

    n_scan = int(os.environ.get("MLIS_UNET_AB_SCAN", "20"))
    filt = os.environ.get("MLIS_UNET_AB_FILTER", "")
    tiny = bool(os.environ.get("MLIS_UNET_AB_TINY"))
    shapes = SHAPES
    if tiny:
        shapes = [("tiny", 1, 2, 640, 40), ("tiny-pad", 1, 2, 600, 40)]
        n_scan = 2
        if jax.default_backend() == "cpu":
            import functools as _ft
            fa.pl.pallas_call = _ft.partial(fa.pl.pallas_call,
                                            interpret=True)

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention as jax_flash)
    except ImportError as e:
        print(f"RESULT stock: unavailable ({e})", flush=True)
        return

    for name, b, h, s, d in shapes:
        if filt and filt not in name:
            continue
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        vt = v.swapaxes(-1, -2)

        def bench(tag, call, out_snd=False, q=q):
            def loop(qq):
                def body(qc, _):
                    o = call(qc)
                    if out_snd:               # [b,h,d,s] -> [b,h,s,d]
                        o = o.swapaxes(-1, -2)
                    return qc + o.astype(qc.dtype) * 1e-6, None
                qc, _ = jax.lax.scan(body, qq, None, length=n_scan)
                return jnp.mean(qc.astype(jnp.float32))
            try:
                fn = jax.jit(loop)
                t0 = time.time()
                np.asarray(fn(q))
                dt = time.time() - t0
                times = []
                for _ in range(5):
                    t0 = time.time()
                    np.asarray(fn(q))
                    times.append((time.time() - t0) / n_scan * 1e3)
                times.sort()
                print(f"RESULT {name}/{tag}: {times[0]:.3f} ms/attention "
                      f"med={times[2]:.3f} max={times[-1]:.3f} n=5 "
                      f"(compile {dt:.1f}s)", flush=True)
            except Exception as e:  # noqa: BLE001 - record and continue
                print(f"RESULT {name}/{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:240]}", flush=True)

        # ---- ours-t: shipped planner pick + explicit geometries ----
        bench("ours-t-default", lambda qc: fa.flash_attention_t(qc, k, vt),
              out_snd=True)
        geoms = [(1024, 1024), (512, 1024)] if not tiny else []
        for bq_, bk_ in geoms:
            if bq_ > s or bk_ > s:
                continue
            bench(f"ours-t-b{bq_}x{bk_}",
                  lambda qc, bq_=bq_, bk_=bk_: fa.flash_attention_t(
                      qc, k, vt, block_q=bq_, block_k=bk_),
                  out_snd=True)

        # ---- stock kernel, natural layout (kernel-only cost) ----
        kv_pad = 512 if not tiny else 128
        sp = -(-s // kv_pad) * kv_pad
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        kp, vp = (jnp.pad(k, pad), jnp.pad(v, pad)) if sp != s else (k, v)
        seg = None
        if sp != s:
            ids_kv = (jnp.arange(sp) >= s).astype(jnp.float32)
            seg = SegmentIds(q=jnp.zeros((b, s), jnp.float32),
                             kv=jnp.broadcast_to(ids_kv, (b, sp)))

        def stock(blk_q, blk_k):
            bs = BlockSizes(
                block_q=blk_q, block_k_major=blk_k, block_k=blk_k,
                block_b=1, block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
                block_k_dkv=blk_k, block_q_dkv=blk_q, block_k_major_dq=blk_k,
                block_k_dq=blk_k, block_q_dq=blk_q)

            def call(qc):
                return jax_flash(qc, kp, vp, segment_ids=seg, causal=False,
                                 sm_scale=d ** -0.5, block_sizes=bs)
            return call

        stock_geoms = ([(128, 128)] if tiny else
                       [(512, 512), (512, 1024), (256, 512), (1024, 1024)])
        for bq_, bk_ in stock_geoms:
            if bq_ > s or sp % bk_:
                continue
            bench(f"stock-q{bq_}k{bk_}", stock(bq_, bk_))

        # ---- xla anchor ----
        bench("xla", lambda qc: attention_xla(qc, k, v))

        # ---- numerics: stock(+segids) vs f32 reference ----
        try:
            bq_ = min(512, s)
            ref = attention_xla(q.astype(jnp.float32), k.astype(jnp.float32),
                                v.astype(jnp.float32))
            got = stock(bq_, kv_pad)(q)
            diff = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
            print(f"RESULT {name}/stock-numerics: max|diff|={diff:.5f} "
                  f"{'PASS' if diff < 0.02 else 'FAIL'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name}/stock-numerics: FAILED "
                  f"{type(e).__name__}: {str(e)[:240]}", flush=True)


if __name__ == "__main__":
    main()
