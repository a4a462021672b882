"""Direct measurement of the d_head padding cost in the flash kernels.

Times scanned flash_attention_t calls at fixed (b,h,S) across d_head
40/64/128.  If the QK contraction is charged at the padded 128 depth, all
three run in ~the same time (the QK FLOPs dominate at S=4096); if the MXU
charged the true depth, d=40/64 would be proportionally faster.  This
closes VERDICT r2 item 3: head-packing two d=64 heads into one 128-lane
contraction is provably a no-op (the packed operand is block-diagonal, so
the packed matmul does bq*128*2bk MACs = exactly two padded d=64 matmuls),
so the only open question is whether the padding cost is real.

The first matmul's FLOP ratio QK:PV is 1:1; only QK pads (transposed
kernel streams d on sublanes for PV), so perfectly-charged-depth would
give t(64)/t(128) = (64+128)/(128+128) = 0.75, fully-padded = 1.0.

Usage: python tools/flash_d_bench.py [n_scan]
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
    b, h, s = 2, 8, 4096
    rng = np.random.default_rng(0)
    base = {}
    for d in (40, 64, 128):
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        vt = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.bfloat16)

        def loop(q, k, vt):
            def body(q, _):
                o = fa.flash_attention_t(q, k, vt)   # [b,h,d,s]
                # feed back so the scan can't hoist the kernel
                return q + o.swapaxes(-1, -2).astype(q.dtype) * 1e-6, None
            q, _ = jax.lax.scan(body, q, None, length=n_scan)
            # scalar fetch: returning q (MBs) through the axon tunnel
            # dominated the round-3 numbers and faked d-insensitivity
            return jnp.mean(q.astype(jnp.float32))

        fn = jax.jit(loop)
        t0 = time.time()
        np.asarray(fn(q, k, vt))
        print(f"d={d}: compile+first {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(q, k, vt))
            times.append(time.time() - t0)
        best = min(times) / n_scan
        base[d] = best
        print(f"RESULT flash d={d}: {best * 1e3:.3f} ms/attention", flush=True)
    r64 = base[64] / base[128]
    r40 = base[40] / base[128]
    print(f"RESULT padding ratio: t(40)/t(128)={r40:.2f} "
          f"t(64)/t(128)={r64:.2f} (1.0 = fully padded QK, "
          f"0.75/0.66 = true-depth charging)", flush=True)


if __name__ == "__main__":
    main()
