"""On-hardware smoke of the shard_map'ed Pallas flash path (VERDICT r2
item 6).

The CPU dryrun mesh never exercises Mosaic-inside-shard_map (use_flash() is
false off-TPU), so this runs on the real chip:

1. flash_attention + flash_attention_t through attention()/attention_t()
   with a 1x1 (dp=1, tp=1) Mesh installed — the explicit shard_map
   composition — checked numerically against the direct kernel call;
2. a tiny-model generate() through the session API with --tp 1 (the product
   path: sharded params, shard_map'ed attention inside the scanned loop).

Usage: python tools/mesh_flash_smoke.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    from mlimgsynth_tpu.ops import attention as attn
    from mlimgsynth_tpu.parallel.mesh import make_mesh

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    assert attn.use_flash(), "flash path inactive - not on TPU?"

    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 4096, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * 0.3
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16) * 0.3

    mesh = make_mesh(1, tp=1)
    t0 = time.time()
    direct = np.asarray(attn.attention(q, k, v), np.float32)
    attn.MESH = mesh
    try:
        meshed = np.asarray(attn.attention(q, k, v), np.float32)
        vt = v.swapaxes(-1, -2)
        direct_t = np.asarray(attn.attention_t(q, k, vt), np.float32)
    finally:
        attn.MESH = None
    err = np.abs(meshed - direct).max()
    err_t = np.abs(direct_t.swapaxes(-1, -2) - direct).max()
    print(f"RESULT mesh-flash kernel: shard_map-vs-direct max|diff|={err:.2e}"
          f", transposed-vs-plain {err_t:.2e} ({time.time() - t0:.1f}s)",
          flush=True)
    assert err < 1e-2 and err_t < 1e-2, (err, err_t)

    # stock-kernel dispatch inside shard_map (the DiT regime under
    # --tp/--dp: Mosaic custom calls run per-device in the explicit
    # shard_map, stock included)
    from mlimgsynth_tpu.ops import stock_flash as sf
    bs, hs, ss = 2, 24, 4250
    qs = jnp.asarray(rng.standard_normal((bs, hs, ss, d)), jnp.bfloat16) * .3
    ks = jnp.asarray(rng.standard_normal((bs, hs, ss, d)), jnp.bfloat16) * .3
    vs = jnp.asarray(rng.standard_normal((bs, hs, ss, d)), jnp.bfloat16) * .3
    assert sf.eligible(qs, ks, vs, False, mesh=mesh)
    t0 = time.time()
    direct_s = np.asarray(attn.attention(qs, ks, vs), np.float32)
    attn.MESH = mesh
    try:
        meshed_s = np.asarray(attn.attention(qs, ks, vs), np.float32)
    finally:
        attn.MESH = None
    err_s = np.abs(meshed_s - direct_s).max()
    print(f"RESULT mesh-stock kernel: shard_map-vs-direct "
          f"max|diff|={err_s:.2e} ({time.time() - t0:.1f}s)", flush=True)
    assert err_s < 1e-2, err_s

    # product path: tiny generate over the 1x1 mesh (forced at tp=dp=1)
    os.environ["MLIS_TINY_MODELS"] = "1"
    os.environ["MLIS_FORCE_MESH"] = "1"
    import tempfile
    from helpers import write_tiny_checkpoint
    from mlimgsynth_tpu.api import MLImgSynth
    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "tiny.safetensors")
        write_tiny_checkpoint(ckpt)
        ses = MLImgSynth()
        for n_, v_ in [("model", ckpt), ("model-type", "sd1"),
                       ("image-dim", "512,512"), ("steps", "2"),
                       ("seed", "42"), ("prompt", "a mesh smoke"),
                       ("weight-type", "f32"), ("tp", "1"), ("dp", "1")]:
            ses.option_set_str(n_, v_)
        t0 = time.time()
        img = ses.generate()
        ok = np.isfinite(np.asarray(img)).all()
        print(f"RESULT mesh-flash generate: tp=1 dp=1 512px tiny-model "
              f"finite={ok} ({time.time() - t0:.1f}s)", flush=True)
        assert ok


if __name__ == "__main__":
    main()
