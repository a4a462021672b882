"""Prove the S(1) scoped-VMEM escape is deterministic (VERDICT r2 item 4).

Compiles the previously-flaky danger-window attention shapes N times in
FRESH subprocesses with the persistent compilation cache disabled, so every
iteration is a real XLA compile.  The round-2 failure mode was a
nondeterministic "Ran out of memory in memory space vmem" at compile time
(identical program compiling on one attempt and not the next); N clean
compiles at the full-speed blocks is the determinism evidence.

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
    (2, 5, 9216, 64),    # SD2-768 L0 (14.2M out: split into 2)
    (2, 10, 4096, 64),   # SDXL L1    (13.1M out: split into 2)
]
for (b, h, s, d) in shapes:
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * 0.5
    vt = q.swapaxes(-1, -2)
    out = np.asarray(fa.flash_attention_t(q, q, vt), np.float32)
    assert np.isfinite(out).all(), (b, h, s, d)
    out = np.asarray(fa.flash_attention(q, q, q), np.float32)
    assert np.isfinite(out).all(), (b, h, s, d)
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
                           timeout=2400)
        good = r.returncode == 0 and "CHILD_OK" in r.stdout
        ok += good
        tail = (r.stderr.strip().splitlines() or [""])[-1][:160]
        print(f"compile {i + 1}/{n}: {'OK' if good else 'FAIL ' + tail}",
              flush=True)
        if not good and "vmem" in r.stderr.lower():
            print("RESULT FAIL scoped-vmem OOM reproduced", flush=True)
            return 1
    print(f"RESULT vmem determinism: {ok}/{n} fresh compiles clean",
          flush=True)
    return 0 if ok == n else 1


if __name__ == "__main__":
    sys.exit(main())
