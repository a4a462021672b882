"""SD3 joint-attention kernel attribution + variant A/B at the real shape.

Round-4 follow-up to queue #13/#15: block geometry, padding, and the
online-max bookkeeping were all refuted as the SD3 attention bottleneck
(best variant 301.8 vs 310.5 ms/step against an 85.7 ms floor).  This
bench times the kernel IN ISOLATION at the SD3-medium CFG shape
(bh=2*24, S=4250 joint, d=64, bf16) across:

  * default kernel (static-max, round-4 default)
  * online-max kernel (round-3 default, sanity anchor)
  * MLIS_FLASH_SPLITK=2/4 sub-chains (MXU/VPU overlap hypothesis)
  * ablations (garbage numerics, timing only): noexp (mask+scale pass,
    no exp2) and nosm (straight cast: pure QK+PV MXU time)
  * explicit block geometries x splitk
  * the stock jax.experimental pallas TPU flash kernel (padded to 4608)
  * plain XLA softmax attention (materialized logits)

The ablations bound the kernel's MXU floor and the per-logit VPU/EUP
cost directly, instead of inferring them from step-level A/Bs.

Usage: python tools/flash_sd3_bench.py [n_scan]
"""
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
    from mlimgsynth_tpu.ops import flash_attention as fa

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b, h, s, d = 2, 24, 4250, 64
    if os.environ.get("MLIS_SD3BENCH_TINY"):    # CPU smoke: trace coverage
        b, h, s, n_scan = 1, 2, 600, 2
        if jax.default_backend() == "cpu":
            import functools as _ft
            _orig = fa.pl.pallas_call
            fa.pl.pallas_call = _ft.partial(_orig, interpret=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
    vt = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.bfloat16)

    def bench(name, call):
        def loop(q, k, vt):
            def body(q, _):
                o = call(q, k, vt)                    # [b,h,d,s]
                return q + o.swapaxes(-1, -2).astype(q.dtype) * 1e-6, None
            q, _ = jax.lax.scan(body, q, None, length=n_scan)
            # SCALAR fetch: returning q itself (26 MB) costs ~10s of ms
            # through the axon tunnel and drowns every kernel difference
            # (this bug polluted the round-3 flash_d_bench d-insensitivity
            # conclusion and the first queue-20 run of this tool)
            return jnp.mean(q.astype(jnp.float32))
        try:
            fn = jax.jit(loop)
            t0 = time.time()
            np.asarray(fn(q, k, vt))
            print(f"[{name}] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(q, k, vt))
                times.append(time.time() - t0)
            best = min(times) / n_scan
            print(f"RESULT {name}: {best * 1e3:.3f} ms/attention "
                  f"(x24 layers = {best * 24e3:.1f} ms/step-equiv)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    def ours(static_max=True, split=1, ablate="", bq=None, bk=None):
        def call(q, k, vt):
            os.environ["MLIS_FLASH_SPLITK"] = str(split)
            os.environ["MLIS_FLASH_ABLATE"] = ablate
            return fa.flash_attention_t(q, k, vt, static_max=static_max,
                                        block_q=bq, block_k=bk)
        return call

    bench("default(static-max)", ours())
    bench("online-max(r3-default)", ours(static_max=False))
    bench("splitk=4", ours(split=4))
    bench("ablate=noexp", ours(ablate="noexp"))
    bench("ablate=nosm(MXU-floor)", ours(ablate="nosm"))
    # grid-overhead hypothesis: fewer, bigger blocks (grid steps at this
    # shape: default(512x2048)=1296, 1024x1024=1200, 1024x2048=720,
    # 2048x1024=540, 2048x2048=432 -- the last two exceed the safe-VMEM
    # logits budget and may OOM; record whatever compiles)
    bench("blk1024x1024", ours(bq=1024, bk=1024))
    bench("blk1024x2048", ours(bq=1024, bk=2048))
    bench("blk2048x1024", ours(bq=2048, bk=1024))
    bench("blk1024x2048+nosm", ours(ablate="nosm", bq=1024, bk=2048))
    # d-insensitivity re-test with clean fetch (round-3 conclusion was
    # polluted by the 26MB host fetch): same bh, same S, d=128
    q128 = jnp.asarray(rng.standard_normal((b, h, s, 128)), jnp.bfloat16) * .3
    k128 = jnp.asarray(rng.standard_normal((b, h, s, 128)), jnp.bfloat16) * .3
    vt128 = jnp.asarray(rng.standard_normal((b, h, 128, s)), jnp.bfloat16)

    def bench128(name, call):
        def loop(q_, k_, vt_):
            def body(qq, _):
                o = call(qq, k128, vt128)
                return qq + o.swapaxes(-1, -2).astype(qq.dtype) * 1e-6, None
            qq, _ = jax.lax.scan(body, q128, None, length=n_scan)
            return jnp.mean(qq.astype(jnp.float32))
        try:
            fn = jax.jit(loop)
            t0 = time.time()
            np.asarray(fn(q128, k128, vt128))
            print(f"[{name}] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(q128, k128, vt128))
                times.append(time.time() - t0)
            print(f"RESULT {name}: {min(times) / n_scan * 1e3:.3f} "
                  f"ms/attention", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    bench128("d128-default", ours())

    # stock jax pallas TPU flash kernel, padded to 4608 (numerics include
    # the zero-padded kv rows -- timing-only comparison)
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as jax_flash)
        sp = 4608
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        qp, kp = jnp.pad(q, pad), jnp.pad(k, pad)
        vp = jnp.pad(vt.swapaxes(-1, -2), pad)
        bs = BlockSizes(block_q=512, block_k_major=512, block_k=512,
                        block_b=1, block_q_major_dkv=512,
                        block_k_major_dkv=512, block_k_dkv=512,
                        block_q_dkv=512, block_k_major_dq=512,
                        block_k_dq=512, block_q_dq=512)

        def call_jax(q_, k_, vt_):
            o = jax_flash(qp, kp, vp, causal=False, sm_scale=d ** -0.5,
                          block_sizes=bs)
            return o[:, :, :s, :].swapaxes(-1, -2) + vt_ * 0
        bench("jax-stock-flash@4608", call_jax)
    except ImportError as e:
        print(f"RESULT jax-stock-flash: unavailable ({e})", flush=True)

    def call_xla(q_, k_, vt_):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q_ * d ** -0.5, k_,
                        preferred_element_type=jnp.float32)
        p = jax.nn.softmax(sc, axis=-1).astype(q_.dtype)
        return jnp.einsum("bhqk,bhdk->bhdq", p, vt_)
    bench("xla-softmax", call_xla)


if __name__ == "__main__":
    main()
