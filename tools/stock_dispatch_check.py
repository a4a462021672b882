"""On-device validation of the stock-flash dispatch path (queue #23).

Three legs, mirroring what flash_check + vmem_determinism prove for our
own kernels:

1. NUMERICS: attention() (auto dispatch -> ops/stock_flash at these
   shapes) vs the f32 XLA softmax reference on a heads-slab of each DiT
   shape (SD3-medium joint, SD3.5-large joint, Flux single-stream).
2. DETERMINISM: N fresh-subprocess compiles of attention() INSIDE a
   lax.scan at the SD3 shape (persistent cache off) — the in-loop
   context is where scoped-VMEM promotion bites; the >16 MiB output
   gate should make this deterministic.
3. TIMING sanity: scanned ms/attention for dispatch-auto vs
   MLIS_FLASH_STOCK=0 at the SD3 shape (expect ~5.8 vs ~8.5 from
   queue #22).

Usage: python tools/stock_dispatch_check.py [n_determinism=5]
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

SHAPES = [
    ("sd3-joint", (2, 24, 4250, 64)),
    ("sd35l-joint", (2, 38, 4250, 64)),
    ("flux-single", (1, 24, 4352, 128)),
    ("sd3-turbo-b1", (1, 24, 4250, 64)),   # q-padded unpromotable regime
]


def numerics():
    import jax.numpy as jnp
    from mlimgsynth_tpu.ops import stock_flash as sf
    from mlimgsynth_tpu.ops.attention import attention, attention_xla
    import jax
    ok_all = True
    for name, (b, h, s, d) in SHAPES:
        rng = np.random.default_rng(1)
        hs = 2                                   # heads slab: f32 ref memory
        q = jnp.asarray(rng.standard_normal((b, hs, s, d)), jnp.bfloat16) * .5
        k = jnp.asarray(rng.standard_normal((b, hs, s, d)), jnp.bfloat16) * .5
        v = jnp.asarray(rng.standard_normal((b, hs, s, d)), jnp.bfloat16)
        # the slab may fall under the 16 MiB gate -> check the real shape's
        # eligibility separately, then force the path for the slab numerics
        full = jnp.zeros((b, h, s, d), jnp.bfloat16)
        elig = sf.eligible(full, full, full, False)
        os.environ["MLIS_FLASH_STOCK"] = "force"
        try:
            got = np.asarray(jax.jit(attention)(q, k, v), np.float32)
        finally:
            os.environ.pop("MLIS_FLASH_STOCK", None)

        @jax.jit
        def ref32(q, k, v):
            return attention_xla(q.astype(jnp.float32),
                                 k.astype(jnp.float32),
                                 v.astype(jnp.float32))
        ref = np.asarray(ref32(q, k, v), np.float32)
        diff = float(np.max(np.abs(got - ref)))
        rel = diff / max(float(np.max(np.abs(ref))), 1e-6)
        ok = np.isfinite(got).all() and rel < 0.02
        ok_all &= ok
        print(f"RESULT numerics {name}: eligible={elig} "
              f"max|diff|={diff:.5f} rel={rel:.4f} "
              f"{'OK' if ok and elig else 'FAIL'}", flush=True)
    return ok_all


CHILD = r"""
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, %(repo)r)
from mlimgsynth_tpu.ops.attention import attention
rng = np.random.default_rng(0)
for (b, h, s, d) in ((2, 24, 4250, 64), (1, 24, 4250, 64)):
    q0 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * 0.5

    @jax.jit
    def loop(q):
        def body(q, _):
            o = attention(q, q, q)
            return q + o.astype(q.dtype) * 1e-3, None
        q, _ = jax.lax.scan(body, q, None, length=2)
        return jnp.mean(q.astype(jnp.float32))
    out = np.asarray(loop(q0))
    assert np.isfinite(out).all(), (b, h, s, d)
print("CHILD_OK")
"""


def determinism(n):
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["MLIS_NO_COMPILE_CACHE"] = "1"
    ok = 0
    for i in range(n):
        r = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO}],
                           capture_output=True, text=True, env=env,
                           timeout=3000)
        good = r.returncode == 0 and "CHILD_OK" in r.stdout
        ok += good
        tail = (r.stderr.strip().splitlines() or [""])[-1][:160]
        print(f"compile {i + 1}/{n}: {'OK' if good else 'FAIL ' + tail}",
              flush=True)
    print(f"RESULT stock in-scan determinism: {ok}/{n} clean", flush=True)
    return ok == n


def timing(n_scan=20):
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.ops.attention import attention
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 24, 4250, 64
    q0 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * .3

    for name, envval in (("dispatch-auto", None), ("dispatch-ours", "0")):
        if envval is None:
            os.environ.pop("MLIS_FLASH_STOCK", None)
        else:
            os.environ["MLIS_FLASH_STOCK"] = envval

        def loop(q):
            def body(q, _):
                o = attention(q, q, q)
                return q + o.astype(q.dtype) * 1e-6, None
            q, _ = jax.lax.scan(body, q, None, length=n_scan)
            return jnp.mean(q.astype(jnp.float32))
        fn = jax.jit(loop)
        t0 = time.time()
        np.asarray(fn(q0))
        print(f"[{name}] compile+first {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn(q0))
            times.append(time.time() - t0)
        print(f"RESULT {name}: {min(times) / n_scan * 1e3:.3f} ms/attention",
              flush=True)
    os.environ.pop("MLIS_FLASH_STOCK", None)


def main():
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ok = numerics()
    timing()
    ok &= determinism(n)
    print(f"RESULT stock dispatch: {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
