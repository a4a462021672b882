"""CORRECTED stock-flash A/B at the SD3 joint-attention shape.

Queue #21's jax-stock-flash entry was INVALID: its call closure ignored
the scan carry (used the captured padded constant), so the flash call
was loop-invariant and XLA hoisted it out of the lax.scan — the
"1.47 ms/attention" was (one attention + n_scan trivial adds)/n_scan,
not a kernel time.  Every variant here chains on the carry:

  body: o = call(q_carry); carry' = q_carry + o * 1e-6

so the attention MUST execute once per scan step.  Variants:

  * ours-t default (anchor; expect ~9.3-9.7 ms from queue #21)
  * ours normal-layout kernel (fa.flash_attention, [b,h,s,d] out)
  * stock jax.experimental pallas TPU flash at several paddings/blocks
  * stock + segment-ids masking of the padded kv tail (true adoption
    numerics: what we would actually ship)
  * xla-softmax anchor (queue #21: 28.7 ms)

Also prints an on-device numerics check: stock+segids vs f32 softmax
reference on the unpadded region (max|diff|), since adoption requires
masked-pad correctness, not just speed.

Usage: python tools/flash_stock_ab.py [n_scan]
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
    tiny = bool(os.environ.get("MLIS_SD3BENCH_TINY"))
    if tiny:    # CPU smoke: trace coverage only
        b, h, s, n_scan = 1, 2, 600, 2
        if jax.default_backend() == "cpu":
            import functools as _ft
            # fa.pl IS jax.experimental.pallas — patching it switches the
            # stock kernel to interpret mode too (shared module object)
            fa.pl.pallas_call = _ft.partial(fa.pl.pallas_call,
                                            interpret=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    def bench(name, call, out_snd=False):
        """call(q_carry) -> o with o broadcast-addable to q_carry."""
        def loop(q):
            def body(qc, _):
                o = call(qc)
                if out_snd:                       # [b,h,d,s] -> [b,h,s,d]
                    o = o.swapaxes(-1, -2)
                return qc + o.astype(qc.dtype) * 1e-6, None
            qc, _ = jax.lax.scan(body, q, None, length=n_scan)
            return jnp.mean(qc.astype(jnp.float32))   # scalar fetch only
        try:
            fn = jax.jit(loop)
            t0 = time.time()
            np.asarray(fn(q))
            print(f"[{name}] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(q))
                times.append(time.time() - t0)
            best = min(times) / n_scan
            print(f"RESULT {name}: {best * 1e3:.3f} ms/attention "
                  f"(x24 layers = {best * 24e3:.1f} ms/step-equiv)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # ---- ours (anchors) ----
    vt = v.swapaxes(-1, -2)
    bench("ours-t-default", lambda qc: fa.flash_attention_t(qc, k, vt),
          out_snd=True)
    bench("ours-normal", lambda qc: fa.flash_attention(qc, k, v))

    # ---- stock ----
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention as jax_flash)
    except ImportError as e:
        print(f"RESULT stock: unavailable ({e})", flush=True)
        return

    def stock(sp, blk_q, blk_k, segids=False):
        pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
        kp, vp = jnp.pad(k, pad), jnp.pad(v, pad)
        bs = BlockSizes(block_q=blk_q, block_k_major=blk_k, block_k=blk_k,
                        block_b=1, block_q_major_dkv=blk_q,
                        block_k_major_dkv=blk_k, block_k_dkv=blk_k,
                        block_q_dkv=blk_q, block_k_major_dq=blk_k,
                        block_k_dq=blk_k, block_q_dq=blk_q)
        seg = None
        if segids:
            ids_kv = jnp.asarray(
                np.concatenate([np.zeros((b, s), np.float32),
                                np.ones((b, sp - s), np.float32)], axis=1))
            seg = SegmentIds(q=jnp.zeros((b, sp), jnp.float32), kv=ids_kv)

        def call(qc):
            qp = jnp.pad(qc, pad)
            o = jax_flash(qp, kp, vp, segment_ids=seg, causal=False,
                          sm_scale=d ** -0.5, block_sizes=bs)
            return o[:, :, :s, :]
        return call

    if tiny:
        grids = [(1024, 256, 256, False), (1024, 256, 256, True)]
    else:
        grids = [(4608, 512, 512, False),
                 (4608, 768, 768, False),
                 (4352, 256, 256, False),
                 (4608, 512, 1536, False),
                 (4608, 1024, 1536, False),
                 (4608, 768, 1536, False),
                 (4608, 512, 2304, False),
                 (4608, 512, 1536, True),
                 (4608, 512, 512, True)]
    for sp, bq_, bk_, seg in grids:
        tag = f"stock@{sp}-q{bq_}k{bk_}" + ("-segids" if seg else "")
        bench(tag, stock(sp, bq_, bk_, segids=seg))

    # ---- xla anchor ----
    def call_xla(qc):
        sc = jnp.einsum("bhqd,bhkd->bhqk", qc * d ** -0.5, k,
                        preferred_element_type=jnp.float32)
        p = jax.nn.softmax(sc, axis=-1).astype(qc.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)
    bench("xla-softmax", call_xla)

    # ---- numerics: stock+segids vs f32 reference on a small slab ----
    hs = min(h, 2)
    qs, ks, vs = q[:, :hs], k[:, :hs], v[:, :hs]
    sp = 4608 if not tiny else 1024
    pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
    ids_kv = jnp.asarray(np.concatenate(
        [np.zeros((b, s), np.float32), np.ones((b, sp - s), np.float32)],
        axis=1))
    seg = SegmentIds(q=jnp.zeros((b, sp), jnp.float32), kv=ids_kv)
    bs_n = 512 if not tiny else 256
    bsz = BlockSizes(block_q=bs_n, block_k_major=bs_n, block_k=bs_n,
                     block_b=1, block_q_major_dkv=bs_n,
                     block_k_major_dkv=bs_n, block_k_dkv=bs_n,
                     block_q_dkv=bs_n, block_k_major_dq=bs_n,
                     block_k_dq=bs_n, block_q_dq=bs_n)

    @jax.jit
    def both(qs, ks, vs):
        o = jax_flash(jnp.pad(qs, pad), jnp.pad(ks, pad), jnp.pad(vs, pad),
                      segment_ids=seg, causal=False, sm_scale=d ** -0.5,
                      block_sizes=bsz)[:, :, :s, :]
        sc = jnp.einsum("bhqd,bhkd->bhqk", qs.astype(jnp.float32) * d ** -0.5,
                        ks.astype(jnp.float32))
        p = jax.nn.softmax(sc, axis=-1)
        ref = jnp.einsum("bhqk,bhkd->bhqd", p, vs.astype(jnp.float32))
        return jnp.max(jnp.abs(o.astype(jnp.float32) - ref)), \
            jnp.max(jnp.abs(ref))
    try:
        diff, scale = (np.asarray(x) for x in both(qs, ks, vs))
        ok = diff < 0.02 * max(float(scale), 1.0)
        print(f"RESULT stock-numerics: max|diff|={float(diff):.5f} "
              f"(ref scale {float(scale):.3f}) "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"RESULT stock-numerics: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
