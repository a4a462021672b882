"""Prove the scoped-VMEM planning is deterministic (VERDICT r2 item 4).

Compiles the historically-flaky attention shapes N times in FRESH
subprocesses with the persistent compilation cache disabled, so every
iteration is a real XLA compile.  Crucially the kernels compile INSIDE a
``lax.scan`` (like the production denoise loop): that is the context where
XLA promotes pallas outputs into the scoped-VMEM stack — standalone
programs never promoted, which is how the round-3 chunking policy passed
12/12 here while the sd21 loop still OOM'd.  It also caught the falsified
f32-output regime 1/10 (f32 pallas outputs get S(1)-placed even standalone
and even above 16 MiB).  The shapes cover the planner regimes: stack+output
resident at full dv (SD2-L1), the shrunk-dv no-MXU-sum variant
(SD2-L0/SDXL-L1), and naturally-unpromotable big bf16 outputs (batch-8).

Usage: python tools/vmem_determinism.py [N=10]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, %(repo)r)
from mlimgsynth_tpu.ops import flash_attention as fa
rng = np.random.default_rng(0)
shapes = [
    (2, 5, 9216, 64),    # SD2-768 L0: q-padded into the unpromotable regime
    (2, 10, 4096, 64),   # SDXL L1 / SD2 L1 family: stack+output resident
    (2, 10, 2304, 64),   # the exact round-3 in-loop OOM shape
]
for (b, h, s, d) in shapes:
    q0 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * 0.5

    @jax.jit
    def loop_t(q):
        def body(q, _):
            o = fa.flash_attention_t(q, q, q.swapaxes(-1, -2))
            return q + o.swapaxes(-1, -2).astype(q.dtype) * 1e-3, None
        q, _ = jax.lax.scan(body, q, None, length=2)
        return q

    @jax.jit
    def loop_s(q):
        def body(q, _):
            o = fa.flash_attention(q, q, q)
            return q + o.astype(q.dtype) * 1e-3, None
        q, _ = jax.lax.scan(body, q, None, length=2)
        return q

    out = np.asarray(loop_t(q0), np.float32)
    assert np.isfinite(out).all(), ("t", b, h, s, d)
    out = np.asarray(loop_s(q0), np.float32)
    assert np.isfinite(out).all(), ("s", b, h, s, d)

import os
if os.environ.get("MLIS_VMEM_UNET_STOCK"):
    # The queue-42 unet-stock route: stock kernel with PROMOTION-WINDOW
    # outputs, relying on regime-(a) frame accounting (_stock_frame).
    # These are the shapes attn_mhead would route when
    # MLIS_FLASH_UNET_STOCK=auto ships.
    os.environ["MLIS_FLASH_UNET_STOCK"] = "auto"
    from mlimgsynth_tpu.ops import stock_flash as sf
    for (b, h, s, d) in [(2, 8, 4096, 40), (2, 10, 4096, 64),
                         (2, 20, 1024, 64), (2, 10, 2304, 64),
                         (2, 5, 9216, 64)]:
        q0 = jnp.asarray(rng.standard_normal((b, h, s, d)),
                         jnp.bfloat16) * 0.5
        assert sf.eligible(q0, q0, q0, False), (b, h, s, d)

        @jax.jit
        def loop_u(q):
            def body(q, _):
                o = sf.stock_flash(q, q, q)
                return q + o.astype(q.dtype) * 1e-3, None
            q, _ = jax.lax.scan(body, q, None, length=2)
            return q

        out = np.asarray(loop_u(q0), np.float32)
        assert np.isfinite(out).all(), ("u", b, h, s, d)
print("CHILD_OK")
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    env = dict(os.environ)
    # fresh compiles: no persistent cache
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["MLIS_NO_COMPILE_CACHE"] = "1"   # child never enables it anyway
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
        if not good and "vmem" in r.stderr.lower():
            print("RESULT FAIL scoped-vmem OOM reproduced", flush=True)
            return 1
    print(f"RESULT vmem determinism: {ok}/{n} fresh scanned compiles clean",
          flush=True)
    return 0 if ok == n else 1


if __name__ == "__main__":
    sys.exit(main())
