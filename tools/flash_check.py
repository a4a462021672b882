"""On-device flash-kernel numerics check vs the XLA softmax reference.

Runs both Pallas kernels (standard and transposed) against attention_xla on
the REAL backend (TPU through the tunnel, or CPU interpret) at the shapes the
models actually use, reporting max abs/rel error and finiteness.  Use after
kernel changes: CPU interpret tests can miss Mosaic-compiled behavior.

Usage: python tools/flash_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


SHAPES = [
    # (b, h, sq, sk, d, label)
    (2, 8, 4096, 4096, 40, "SD1.5 L0 self"),
    (2, 10, 4096, 4096, 64, "SDXL L1 self (danger-split)"),
    (2, 5, 9216, 9216, 64, "SD2-768 L0 self (danger-split)"),
    (2, 20, 1024, 1024, 64, "SDXL L2 self (single-k)"),
    (2, 8, 1024, 1024, 80, "SD2-ish"),
    (1, 1, 4096, 4096, 512, "VAE mid attn (wide head)"),
    (2, 8, 600, 600, 64, "ragged (tail mask)"),
]


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    from mlimgsynth_tpu.ops import flash_attention as fa
    from mlimgsynth_tpu.ops.attention import attention_xla

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    bad = 0
    for b, h, sq, sk, d, label in SHAPES:
        q = jnp.asarray(rng.standard_normal((b, h, sq, d)).astype(np.float32)
                        * 0.7).astype(jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, sk, d)).astype(np.float32)
                        * 0.7).astype(jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, sk, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        ref = np.asarray(attention_xla(q, k, v), np.float32)
        out = np.asarray(fa.flash_attention(q, k, v), np.float32)
        out_t = np.asarray(
            fa.flash_attention_t(q, k, v.swapaxes(-1, -2)), np.float32
        ).swapaxes(-1, -2)
        for name, o in (("std", out), ("T", out_t)):
            fin = np.isfinite(o).all()
            err = np.abs(o - ref).max()
            rel = err / max(np.abs(ref).max(), 1e-6)
            ok = fin and rel < 0.05
            bad += not ok
            print(f"{label:28s} [{name:3s}] finite={bool(fin)} "
                  f"maxabs={err:.4f} rel={rel:.4f} {'OK' if ok else 'BAD'}",
                  flush=True)
    # SDXL-1024 VAE mid attention (seq 16384, single d=512 head): too big
    # for the O(S^2) XLA reference, so finite-only — this is the shape that
    # exposed the scoped-VMEM OOM when the padded output grew past a
    # 128-lane tile (kernel mxu_sum gating)
    q = jnp.asarray(rng.standard_normal((1, 1, 16384, 512))
                    .astype(np.float32) * 0.1).astype(jnp.bfloat16)
    o = np.asarray(fa.flash_attention(q, q, q), np.float32)
    fin = np.isfinite(o).all()
    bad += not fin
    print(f"{'SDXL-1024 VAE attn (finite)':28s} [std] finite={bool(fin)} "
          f"{'OK' if fin else 'BAD'}", flush=True)

    print("RESULT", "FAIL" if bad else "PASS", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
