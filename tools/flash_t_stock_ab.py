"""Can stock flash also win the TRANSPOSED-V (attention_t) big shapes?

attention_t callers (UNet/VAE) hold v as [b,h,d,s] and want [b,h,d,s]
out — the layout our kernel consumes/produces natively.  Routing them
through the stock kernel costs two relayouts (v and o).  This times,
carry-chained (scalar fetch), at the big-batch UNet/VAE shapes where the
>16 MiB output gate would allow stock:

  * ours-t (current default)
  * stock + both relayouts (what a dispatch would actually ship)
  * xla anchor

Shapes: sdxl-b8 L1 self (16,10,4096,64), sd15-b8 L0 self (16,8,4096,40),
vae-b8 512px mid (8,1,4096,512).  Also prints stock-vs-f32 numerics at
the wide-head VAE shape (d=512 was not covered by stock_dispatch_check).

Usage: python tools/flash_t_stock_ab.py [n_scan]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SHAPES = [
    ("sdxl-b8-L1", (16, 10, 4096, 64)),
    ("sd15-b8-L0", (16, 8, 4096, 40)),
    ("vae-b8-mid", (8, 1, 4096, 512)),
]


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    from mlimgsynth_tpu.ops import flash_attention as fa
    from mlimgsynth_tpu.ops import stock_flash as sf

    n_scan = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    tiny = bool(os.environ.get("MLIS_SD3BENCH_TINY"))
    shapes = SHAPES
    if tiny:
        shapes = [("vae-tiny", (2, 2, 512, 64))]
        n_scan = 2
        if jax.default_backend() == "cpu":
            import functools as _ft
            fa.pl.pallas_call = _ft.partial(fa.pl.pallas_call,
                                            interpret=True)

    def bench(name, call, q0):
        def loop(q):
            def body(qc, _):
                o = call(qc)                       # [b,h,d,s]
                return qc + o.swapaxes(-1, -2).astype(qc.dtype) * 1e-6, None
            qc, _ = jax.lax.scan(body, q, None, length=n_scan)
            return jnp.mean(qc.astype(jnp.float32))
        try:
            fn = jax.jit(loop)
            t0 = time.time()
            np.asarray(fn(q0))
            print(f"[{name}] compile+first {time.time() - t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(q0))
                times.append(time.time() - t0)
            print(f"RESULT {name}: {min(times) / n_scan * 1e3:.3f} "
                  f"ms/attention", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    for sname, (b, h, s, d) in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
        vt = jnp.asarray(rng.standard_normal((b, h, d, s)), jnp.bfloat16)

        bench(f"{sname} ours-t",
              lambda qc, k=k, vt=vt: fa.flash_attention_t(qc, k, vt), q)
        if d % 128 == 0 or d <= 128:
            bench(f"{sname} stock+relayout",
                  lambda qc, k=k, vt=vt: sf.stock_flash(
                      qc, k, vt.swapaxes(-1, -2)).swapaxes(-1, -2), q)
        if sname.startswith("vae"):
            # the VAE mid-block calls attention() in PLAIN layout (no
            # relayouts either way) — this pair decides its dispatch
            v = vt.swapaxes(-1, -2)
            bench(f"{sname} ours-plain",
                  lambda qc, k=k, v=v: fa.flash_attention(
                      qc, k, v).swapaxes(-1, -2), q)
            bench(f"{sname} stock-plain",
                  lambda qc, k=k, v=v: sf.stock_flash(
                      qc, k, v).swapaxes(-1, -2), q)

        def call_xla(qc, k=k, vt=vt, d=d):
            sc = jnp.einsum("bhqd,bhkd->bhqk", qc * d ** -0.5, k,
                            preferred_element_type=jnp.float32)
            p = jax.nn.softmax(sc, axis=-1).astype(qc.dtype)
            return jnp.einsum("bhqk,bhdk->bhdq", p, vt)
        if s <= 4096:
            bench(f"{sname} xla", call_xla, q)

    # wide-head numerics: stock at d=512 vs f32 reference (small slab)
    b, h, s, d = (2, 1, 1024, 512) if not tiny else (1, 1, 256, 256)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    os.environ["MLIS_FLASH_STOCK"] = "force"
    try:
        got = np.asarray(jax.jit(sf.stock_flash)(q, k, v), np.float32)
    finally:
        os.environ.pop("MLIS_FLASH_STOCK", None)

    @jax.jit
    def ref32(q, k, v):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * d ** -0.5,
                        k.astype(jnp.float32))
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    ref = np.asarray(ref32(q, k, v))
    diff = float(np.max(np.abs(got - ref)))
    rel = diff / max(float(np.max(np.abs(ref))), 1e-6)
    ok = np.isfinite(got).all() and rel < 0.02
    print(f"RESULT wide-head d={d} numerics: max|diff|={diff:.5f} "
          f"rel={rel:.4f} {'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
