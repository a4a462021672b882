"""Benchmark: SD1.5 512px 20-step txt2img end-to-end on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: < 1 s end-to-end on one v5e chip (BASELINE.md).
vs_baseline = baseline_seconds / measured_seconds (>1 means faster than
target).

Uses a real checkpoint if MLIS_MODEL points at one; otherwise synthesizes
random weights with the exact SD1.5 architecture (identical compute graph,
so timings are representative).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_S = 1.0
STEPS = 20
CFG = 7.0
SIZE = 512


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_params(spec, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    out = {}
    for name, ps in spec.items():
        fan = ps.shape[0] if len(ps.shape) >= 2 else 1
        scale = 0.5 / max(1.0, fan) ** 0.5
        out[name] = jnp.asarray(
            (rng.standard_normal(ps.shape) * scale).astype(np.float32),
            dtype=ps.dtype)
    return out


def main():
    t_setup = time.time()
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import clip as C
    from mlimgsynth_tpu.models import unet as U
    from mlimgsynth_tpu.models import vae as V
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)
    from mlimgsynth_tpu.api import (MLImgSynth, _clip_jit, _vae_decode_jit)
    from mlimgsynth_tpu import tokenizer as tok

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    model_path = os.environ.get("MLIS_MODEL", "")
    lat = SIZE // 8
    unet_p = U.UNET_SD1
    vae_p = V.VAE_SD1
    clip_p = C.CLIP_VIT_L_14
    dtype = jnp.bfloat16

    if model_path and os.path.exists(model_path):
        log(f"using checkpoint {model_path}")
        s = MLImgSynth()
        s.option_set("model", model_path)
        s.setup()
        unet_params = s._get_params("unet")
        vae_params = s._get_params("vae")
        clip_params = s._get_params("clip")
        unet_p = s._mt.unet_p
        vae_p = s._mt.vae_p
        clip_p = s._mt.clip_p
    else:
        log("no checkpoint (set MLIS_MODEL); synthesizing SD1.5-shaped "
            "random weights")
        spec_u = B.trace_spec(
            lambda ctx, x, t, c: U.unet_apply(ctx, x, t, c, None, unet_p),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, unet_p.n_ctx)))
        unet_params = synth_params(spec_u, 0)
        spec_v = B.trace_spec(
            lambda ctx, x: V.vae_decode_apply(ctx, x, vae_p),
            jnp.zeros((1, 8, 8, 4)))
        vae_params = synth_params(spec_v, 1)
        spec_c = B.trace_spec(
            lambda ctx, toks: C.clip_text_apply(ctx, toks, clip_p),
            jnp.zeros((1, 77), jnp.int32))
        clip_params = synth_params(spec_c, 2)
    log(f"setup {time.time() - t_setup:.1f}s")

    prompt = "a photograph of an astronaut riding a horse"
    toks = tok.wrap_tokens(clip_p, tok.tokenize(prompt))
    ntoks = tok.wrap_tokens(clip_p, [])
    cfg = SamplerConfig(method="euler", sched="uniform", n_step=STEPS,
                        cfg_scale=CFG)

    def run(seed):
        # text encode (both prompts), denoise loop, vae decode
        emb, _ = _clip_jit(clip_params, np.asarray([toks], np.int32),
                           np.asarray([1], np.int32), clip_p=clip_p,
                           submodel="clip", clip_skip=1, norm=True,
                           want_feat=False, dtype=dtype)
        nemb, _ = _clip_jit(clip_params, np.asarray([ntoks], np.int32),
                            np.asarray([1], np.int32), clip_p=clip_p,
                            submodel="clip", clip_skip=1, norm=True,
                            want_feat=False, dtype=dtype)
        plan = make_plan(cfg, (1, 4, lat, lat), RngPhilox(seed=seed),
                         nfe_per_dxdt=2)
        x = run_sampler(unet_params, np.zeros((1, 4, lat, lat), np.float32),
                        plan, np.asarray(emb, np.float32),
                        np.asarray(nemb, np.float32), None, None, None,
                        cfg, unet_p, dtype=dtype)
        img = _vae_decode_jit(vae_params, x.transpose(0, 2, 3, 1),
                              vae_p=vae_p, dtype=dtype)
        return np.asarray(img)

    # warmup / compile
    t0 = time.time()
    img = run(42)
    log(f"compile+first-run {time.time() - t0:.1f}s; "
        f"img finite: {np.isfinite(img).all()}")

    times = []
    for i in range(3):
        t0 = time.time()
        run(42 + i)
        times.append(time.time() - t0)
        log(f"run {i}: {times[-1]:.3f}s")
    best = min(times)

    result = {
        "metric": f"SD1.5 {SIZE}px {STEPS}-step cfg{CFG:g} txt2img e2e "
                  "latency (text encode + denoise + VAE decode)",
        "value": round(best, 4),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_S / best, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
