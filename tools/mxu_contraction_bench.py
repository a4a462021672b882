"""Is the d_head->128 QK-contraction padding real?  (VERDICT r2 item 3)

Times scanned matmuls with contraction depth 40 / 64 / 128 at identical
output shapes [M, N].  If the MXU charged only for the real depth, K=64
would run ~2x faster than K=128; if the contraction pads to the full 128
depth, all three take the same time.  This decides whether "head-packing"
two d=64 heads into one 128-lane contraction could ever win: the packed
operand is block-diagonal (half zeros), so packing does bq*128*2bk MACs —
exactly the cost of two padded d=64 matmuls (2 * bq*128*bk).  A win is
only possible if K=64 is NOT already charged at depth 128.

Usage: python tools/mxu_contraction_bench.py [n_scan]
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

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    m, n = 4096, 4096    # one attention block's QK geometry (bq x bk)
    rng = np.random.default_rng(0)

    for k in (40, 64, 128):
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        def loop(a, b):
            # keep the bench COMPUTE-bound: reduce the [M,N] product to a
            # column immediately (relu blocks the algebraic a@(b.sum) fold)
            # so XLA fuses the reduce into the matmul and the 64MB f32
            # product never reaches HBM; the tiny column feeds back into a
            # so the scan can't hoist the loop-invariant matmul.
            def body(a, _):
                s = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
                col = jax.nn.relu(s).sum(axis=1, keepdims=True)
                return a + (col * 1e-9).astype(a.dtype), None
            a, _ = jax.lax.scan(body, a, None, length=n_scan)
            return a

        fn = jax.jit(loop)
        t0 = time.time()
        np.asarray(fn(a, b))
        print(f"K={k}: compile+first {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(a, b))
            times.append(time.time() - t0)
        best = min(times)
        flops = 2 * m * k * n * n_scan
        print(f"RESULT K={k}: {best / n_scan * 1e6:.1f} us/matmul "
              f"({flops / best / 1e12:.1f} TFLOP/s real, "
              f"{2 * m * 128 * n * n_scan / best / 1e12:.1f} at depth-128 "
              f"accounting)", flush=True)


if __name__ == "__main__":
    main()
