"""On-device check of the packed-int4 Pallas kernel (ops/q4_matmul.py).

Compares q4_matmul against the XLA unpack+dequant reference at the
shapes the big models actually hit (flux/sd35-large token x width
matmuls), on whatever backend jax picks (run on TPU via the axon
tunnel).  Prints PASS/FAIL per shape.
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.ops import q4_matmul as q4

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU smoke: interpret mode at tiny shapes (wiring check only)
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
    # (m, k, n): flux single-block linear1 (4352 tokens x 3072 -> 21504),
    # flux qkv, sd35-large qkv (2432), a ragged-m case, a bf16 case
    shapes = [
        (4352, 3072, 3072),
        (4352, 3072, 12288),
        (4250, 2432, 7296),
        (77, 768, 3072),
        (130, 640, 5120),
    ] if on_tpu else [(77, 256, 512), (130, 384, 512)]
    n_fail = 0
    for m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * .3,
                        jnp.bfloat16)
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        packed, s = q4.quantize_weight_q4(w)
        pd, sd = jnp.asarray(packed), jnp.asarray(s)
        ref = np.asarray(q4.q4_matmul_xla(x, pd, sd).astype(jnp.float32))
        out = np.asarray(q4.q4_matmul(x, pd, sd).astype(jnp.float32))
        err = np.abs(out - ref).max()
        den = max(np.abs(ref).max(), 1e-6)
        ok = err / den < 2e-2
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} m={m} k={k} n={n} "
              f"max|diff|={err:.4g} rel={err/den:.3g}")
    print(f"RESULT: {'PASS' if n_fail == 0 else f'{n_fail} FAIL'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
