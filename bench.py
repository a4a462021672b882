"""Benchmark: txt2img end-to-end on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
primary config (SD1.5 512px 20 steps, baseline target < 1 s on one v5e —
BASELINE.md); secondary configs ride in its "extra" list and also go to
stderr.  The no-env default runs sd15 + sdxl (both flagships in the
driver record).

Configs (select with MLIS_BENCH=sd15|sdxl|all or a comma list):
  sd15: SD1.5 512px, 20 Euler steps, cfg 7      (baseline 1.0 s)
  sdxl: SDXL 1024px, 20 Euler steps, cfg 7, dual text encoders
        (baseline 4.0 s)
  sd21, sd15-tae, sd15-i2i: further BASELINE configs (sd15-i2i =
        config 4: img2img f_t_ini 0.75 + circular alpha-mask inpainting)
  suffix -b8: batch-8 throughput (s/image at batch 8)
  suffix -q8: int8 weights (MLIS_Q8_MODE=int8|dq selects MXU strategy)
  suffix -q4: packed-int4 weights (in-VMEM nibble unpack; 1/4 bf16 bytes)
  suffix -cnet: ControlNet-conditioned (hint encoder + control branch
        fused into the loop; beyond-reference feature cost)
  suffix -turbo: distilled-model inference shape (4 steps, cfg 1 — the
        uncond pass and the uncond encoder rows are skipped entirely)
  suffix -dc: DeepCache interval 3 (UNets cache the deep levels + mid
        transformer; SD3/Flux cache the deep block tail as a residual)
  suffix -hires: two-pass highres-fix (size -> 2x size latent upscale)
  suffix -slg: skip-layer guidance (MMDiT configs)
  suffix -pag: perturbed-attention guidance scale 3 (SD-UNet configs;
        +1 NFE/step — the guidance-cost anchor next to -slg's)
  suffix -unipc: UniPC bh2 order-2 solver (non-default-solver cost leg)
  suffix -lcm: LCM distilled-inference shape (4 steps, cfg 1, the lcm
        solver's implied distillation timestep grid; SD-UNet configs)
  suffix -t5: real T5-XXL 4.7B int8 conditioning computed on device
        (sd3* configs; all others run the zero-T5 context shape)
  sdxl-refiner: SDXL-refiner 1024px (single bigG tower, aesthetic-score
        labels; beyond-reference model family)
  sd3:  SD3-medium MMDiT 1024px rectified flow (beyond-reference model
        family: 2B joint-attention transformer, dual CLIP towers fused
        into the loop, no-T5 context shape, 16-ch VAE; baseline bar = the
        reference's comparable 1024px SDXL 4 s target)
  sd35-large: SD3.5-large 8B MMDiT (qk-norm) 1024px, always int8
        weight-only (bf16 weights alone would be ~16 GiB); same 4 s bar
  flux-schnell / flux-dev: Flux.1 12B DiT 1024px, int8 weight-only
        (schnell: 4-step distilled; dev: 20-step embedded guidance);
        same 1024px 4 s bar for reference
  sdxl-ens: SDXL base + refiner ensemble-of-experts two-stage pipeline
        (switch 0.8: base stops at sigma(0.2) via keep_tail, refiner
        continues from the same sigma without re-noising; both models
        resident in HBM, the bigG tower weights shared)
  esrgan-x4: Real-ESRGAN RRDBNet x4 upscale 512->2048px (the kernel
        behind session.upscale() / the A1111 hr_upscaler and extras
        paths; on-device latency + full-fetch e2e)

Uses a real checkpoint if MLIS_MODEL points at one; otherwise synthesizes
random weights with the exact architecture (identical compute graph, so
timings are representative).
"""
import json
import os
import sys
import time

import numpy as np

STEPS = 20
CFG = 7.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_params(spec, seed=0, chunk_elems=1 << 28, gain=1.0):
    """Generate random weights ON DEVICE (host->device transfer through the
    axon tunnel is ~40MB/s; generating in HBM is instant).  Tensors are
    bucketed into <= chunk_elems dispatches so the f32 staging buffer
    peaks at ~1 GiB — with several models resident (the ensemble config)
    a single whole-model flat buffer would OOM the chip."""
    import jax
    import jax.numpy as jnp
    items = sorted(spec.items())
    buckets, cur, cur_n = [], [], 0
    for name, ps in items:
        n = int(np.prod(ps.shape))
        if cur and cur_n + n > chunk_elems:
            buckets.append(cur)
            cur, cur_n = [], 0
        cur.append((name, ps))
        cur_n += n
    if cur:
        buckets.append(cur)

    def make_gen(bucket):
        total = sum(int(np.prod(ps.shape)) for _, ps in bucket)

        @jax.jit
        def gen(key):
            # one dispatch per bucket: per-tensor device ops are
            # prohibitively slow through the axon tunnel's per-call latency
            flat = jax.random.uniform(key, (total,), jnp.float32, -1.0, 1.0)
            out = {}
            off = 0
            for name, ps in bucket:
                n = int(np.prod(ps.shape))
                fan = ps.shape[0] if len(ps.shape) >= 2 else 1
                scale = gain * 1.7 * 0.5 / max(1.0, fan) ** 0.5
                out[name] = (flat[off:off + n] * scale).reshape(
                    ps.shape).astype(ps.dtype)
                off += n
            return out

        return gen

    out = {}
    for bi, bucket in enumerate(buckets):
        part = make_gen(bucket)(jax.random.PRNGKey(seed * 1000003 + bi))
        jax.block_until_ready(part)   # bound the staging-buffer overlap
        out.update(part)
    return out


def synth_q8_params(spec, seed=0, chunk_elems=1 << 28,
                    percol_m_hint=None):
    """Synthesize int8 weight-only params ON DEVICE: eligible linear
    weights become (weight_q8 int8, weight_scale f32) pairs directly — no
    host round-trip, which matters at flux scale (the 12B transformer
    only fits one v5e chip quantized; host->HBM runs ~40MB/s here).

    ``percol_m_hint`` (DiT configs): shapes where the cost model prefers
    the int8-MXU ws kernel get PER-COLUMN scales ([N] f32), mirroring
    weights.quantize_linear_weights on the real-checkpoint path."""
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models.blocks import LINEAR_W
    from mlimgsynth_tpu.ops.q8_matmul import KBLOCK, percol_eligible
    plain, q8 = {}, []
    for name, ps in sorted(spec.items()):
        if ps.kind == LINEAR_W and ps.shape[0] % KBLOCK == 0:
            q8.append((name, ps))
        else:
            plain[name] = ps
    out = synth_params(plain, seed)

    buckets, cur, cur_n = [], [], 0
    for name, ps in q8:
        n_el = int(np.prod(ps.shape))
        if cur and cur_n + n_el > chunk_elems:
            buckets.append(cur)
            cur, cur_n = [], 0
        cur.append((name, ps))
        cur_n += n_el
    if cur:
        buckets.append(cur)

    def make_gen(bucket):
        total = sum(int(np.prod(ps.shape)) for _, ps in bucket)

        @jax.jit
        def gen(key):
            flat = jax.random.randint(key, (total,), -127, 128, jnp.int8)
            res = {}
            off = 0
            for name, ps in bucket:
                k, n = ps.shape
                res[name + "_q8"] = flat[off:off + k * n].reshape(k, n)
                off += k * n
                sval = 1.7 * 0.5 / (k ** 0.5) / 73.0
                if (percol_m_hint is not None
                        and percol_eligible(k, n, percol_m_hint)):
                    res[name + "_scale"] = jnp.full((n,), sval,
                                                    jnp.float32)
                else:
                    res[name + "_scale"] = jnp.full(
                        (k // KBLOCK, n), sval, jnp.float32)
            return res
        return gen

    import jax
    for bi, bucket in enumerate(buckets):
        part = make_gen(bucket)(jax.random.PRNGKey(seed * 99991 + bi))
        jax.block_until_ready(part)
        out.update(part)
    return out


def synth_q4_params(spec, seed=0, chunk_elems=1 << 28):
    """Synthesize packed-int4 weight-only params ON DEVICE (two nibbles
    per byte + per-K-block scales; see ops/q4_matmul.py) — quarters the
    bf16 weight residency, e.g. Flux 12B ~6.2 GiB."""
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models.blocks import LINEAR_W
    from mlimgsynth_tpu.ops.q8_matmul import KBLOCK
    plain, q4 = {}, []
    for name, ps in sorted(spec.items()):
        if ps.kind == LINEAR_W and ps.shape[0] % KBLOCK == 0:
            q4.append((name, ps))
        else:
            plain[name] = ps
    out = synth_params(plain, seed)

    buckets, cur, cur_n = [], [], 0
    for name, ps in q4:
        n_el = int(np.prod(ps.shape)) // 2
        if cur and cur_n + n_el > chunk_elems:
            buckets.append(cur)
            cur, cur_n = [], 0
        cur.append((name, ps))
        cur_n += n_el
    if cur:
        buckets.append(cur)

    def make_gen(bucket):
        total = sum(int(np.prod(ps.shape)) // 2 for _, ps in bucket)

        @jax.jit
        def gen(key):
            k1, k2 = jax.random.split(key)
            lo = jax.random.randint(k1, (total,), -7, 8, jnp.int8)
            hi = jax.random.randint(k2, (total,), -7, 8, jnp.int8)
            flat = ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)
            res = {}
            off = 0
            for name, ps in bucket:
                k, n = ps.shape
                res[name + "_q4"] = flat[off:off + k * n // 2].reshape(
                    k // 2, n)
                off += k * n // 2
                res[name + "_scale"] = jnp.full(
                    (k // KBLOCK, n), 1.7 * 0.5 / (k ** 0.5) / 4.0,
                    jnp.float32)
            return res
        return gen

    for bi, bucket in enumerate(buckets):
        part = make_gen(bucket)(jax.random.PRNGKey(seed * 77003 + bi))
        jax.block_until_ready(part)
        out.update(part)
    return out


def bench_config(name):
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import clip as C
    from mlimgsynth_tpu.models import unet as U
    from mlimgsynth_tpu.models import vae as V
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)
    from mlimgsynth_tpu.api import _clip_jit, _vae_decode_u8_jit
    from mlimgsynth_tpu import tokenizer as tok

    method = "euler"
    use_tae = False
    use_q8 = name.endswith("-q8")
    use_q4 = name.endswith("-q4")
    name_base = name[:-3] if (use_q8 or use_q4) else name
    n_batch = 1
    import re as _re
    m = _re.search(r"-b(\d+)$", name_base)   # batch-throughput config
    if m:
        n_batch = int(m.group(1))
        name_base = name_base[:m.start()]
    # BASELINE config 4: img2img (f_t_ini 0.75) + alpha-mask inpainting.
    # (LoRA merging is a load-time cost on the host path, not part of the
    # per-image latency; it is covered by tests/test_api_models.py.)
    use_i2i = name_base == "sd15-i2i"
    if use_i2i:
        name_base = "sd15"
    # The reference's headline memory claim: SDXL 1024px within 4 GiB
    # (README.md:3, via --unet-split + --vae-tile).  Our composition:
    # packed-int4 UNet + int8 CLIP towers + latent-only loop + the
    # single-dispatch tiled VAE decode (api._tiled_decode) as a second
    # program, so the decode workspace never coexists with the loop's.
    use_lowmem = name_base == "sdxl-lowmem"
    if use_lowmem:
        name_base = "sdxl"
        use_q4 = True
    # Two-pass highres-fix shape (base loop at `size`, bilinear latent 2x,
    # img2img refine loop at 2*size, fused decode — the serving
    # enable_hr path's cost profile on raw kernels)
    use_hires = name_base.endswith("-hires")
    if use_hires:
        name_base = name_base[:-6]
        if name_base not in ("sd15", "sd21"):
            raise SystemExit(
                "-hires bench supports single-tower configs "
                "(sd15/sd21) only")
    # Distilled-model latency config (SD-Turbo/LCM-style inference shape:
    # few steps, cfg<=1 so the uncond pass is skipped entirely)
    use_turbo = name_base.endswith("-turbo")
    if use_turbo:
        name_base = name_base[:-6]
    n_steps = 4 if use_turbo else STEPS
    cfg_scale = 1.0 if use_turbo else CFG
    use_cnet = name_base.endswith("-cnet")   # ControlNet-conditioned run
    if use_cnet:
        name_base = name_base[:-5]
    # DeepCache-style encoder caching (PAPERS.md): refresh every 3rd step
    use_dc = name_base.endswith("-dc")
    if use_dc:
        name_base = name_base[:-3]
    # real T5-XXL conditioning (the quality driver in the public SD3
    # pipelines; all other sd3 configs run the zero-T5 shape)
    use_t5 = name_base.endswith("-t5")
    if use_t5:
        name_base = name_base[:-3]
    # Skip-layer guidance (SD3.5-medium's recommended sampling mode):
    # +1 NFE/step inside the default [0.01, 0.2) step window
    use_slg = name_base.endswith("-slg")
    if use_slg:
        name_base = name_base[:-4]
        if not name_base.startswith("sd3"):
            raise SystemExit("-slg bench supports the MMDiT configs only")
    # Perturbed-attention guidance (+1 NFE/step, identity mid-block
    # self-attention) — the UNet-side guidance-cost anchor next to -slg
    use_pag = name_base.endswith("-pag")
    if use_pag:
        name_base = name_base[:-4]
        if name_base not in ("sd15", "sd21", "sdxl"):
            raise SystemExit("-pag bench supports the SD-UNet configs only")
    # Non-default-solver cost leg (UniPC bh2 order-2)
    use_unipc = name_base.endswith("-unipc")
    if use_unipc:
        name_base = name_base[:-6]
    # LCM distilled-inference shape: 4 steps at cfg 1 on the lcm solver's
    # implied distillation timestep grid (sampling/sampler.py:116)
    use_lcm = name_base.endswith("-lcm")
    if use_lcm:
        name_base = name_base[:-4]
        if name_base not in ("sd15", "sd21", "sdxl"):
            raise SystemExit("-lcm bench supports the SD-UNet configs only")
        n_steps = 4
        cfg_scale = 1.0
    flow = False
    if name_base == "sdxl":
        size, baseline = 1024, 4.0
        unet_p, clip_p, clip2_p, vae_p = (U.UNET_SDXL, C.CLIP_VIT_L_14,
                                          C.CLIP_VIT_BIGG_14, V.VAE_SDXL)
    elif name_base == "sd3":
        # beyond-reference model family: SD3-medium MMDiT (rectified flow,
        # 16-ch VAE, dual CLIP towers + zero T5 rows — the no-T5 pipeline
        # shape).  Baseline bar: the reference's SDXL-1024 4 s target (its
        # largest comparable 1024px config; it has no transformer family).
        from mlimgsynth_tpu.models import mmdit as MM
        size, baseline = 1024, 4.0
        unet_p, clip_p, clip2_p, vae_p = (MM.MMDIT_SD3_MEDIUM,
                                          C.CLIP_VIT_L_14,
                                          C.CLIP_VIT_BIGG_14, V.VAE_SD3)
        flow = True
    elif name_base == "sd35-medium":
        # beyond-reference model family: SD3.5-medium (MMDiT-X: qk-norm,
        # 384-grid pos embed, dual attention in x-blocks 0..12).  ~2.5B
        # runs bf16 on one v5e.
        from mlimgsynth_tpu.models import mmdit as MM
        size, baseline = 1024, 4.0
        unet_p, clip_p, clip2_p, vae_p = (MM.MMDIT_SD35_MEDIUM,
                                          C.CLIP_VIT_L_14,
                                          C.CLIP_VIT_BIGG_14, V.VAE_SD3)
        flow = True
    elif name_base == "sd35-large":
        # beyond-reference model family: SD3.5-large (8B MMDiT, qk-norm).
        # bf16 would need ~16 GiB for weights alone, so this config is
        # always int8 weight-only (same route that fits Flux 12B).
        from mlimgsynth_tpu.models import mmdit as MM
        size, baseline = 1024, 4.0
        unet_p, clip_p, clip2_p, vae_p = (MM.MMDIT_SD35_LARGE,
                                          C.CLIP_VIT_L_14,
                                          C.CLIP_VIT_BIGG_14, V.VAE_SD3)
        flow = True
        use_q8 = True
    elif name_base == "sdxl-refiner":
        # beyond-reference model family: single bigG tower + aesthetic label
        size, baseline = 1024, 4.0
        unet_p, clip_p, clip2_p, vae_p = (U.UNET_SDXL_REFINER,
                                          C.CLIP_VIT_BIGG_14, None,
                                          V.VAE_SDXL)
    elif name_base == "sd21":
        # BASELINE config 2: SD v2.1 768px, DPM++ 2M, v-prediction
        size, baseline = 768, 2.25
        unet_p, clip_p, clip2_p, vae_p = (U.UNET_SD2, C.CLIP_VIT_H_14,
                                          None, V.VAE_SD1)
        method = "dpmpp2m"
    elif name_base == "sd15-tae":
        # BASELINE config 3: TAE fast-decode swap-in at SD1.5 512px
        size, baseline = 512, 1.0
        unet_p, clip_p, clip2_p, vae_p = (U.UNET_SD1, C.CLIP_VIT_L_14,
                                          None, V.VAE_SD1)
        use_tae = True
    else:
        size, baseline = 512, 1.0
        unet_p, clip_p, clip2_p, vae_p = (U.UNET_SD1, C.CLIP_VIT_L_14,
                                          None, V.VAE_SD1)
    # experiment override (also lets the CI smoke run tiny geometries)
    size = int(os.environ.get("MLIS_BENCH_SIZE") or size)
    lat = size // 8
    dtype = jnp.bfloat16

    t0 = time.time()
    if flow:
        from mlimgsynth_tpu.models import mmdit as MM
        spec_u = B.trace_spec(
            lambda ctx, x, t, c, y: MM.mmdit_apply(ctx, x, t, c, y, unet_p),
            jnp.zeros((1, 8, 8, unet_p.n_ch_in)), jnp.zeros((1,)),
            jnp.zeros((1, 77, unet_p.d_ctx_in)),
            jnp.zeros((1, unet_p.d_pooled)))
    else:
        spec_u = B.trace_spec(
            lambda ctx, x, t, c: U.unet_apply(
                ctx, x, t, c,
                jnp.zeros((1, unet_p.ch_adm_in)) if unet_p.ch_adm_in
                else None, unet_p),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, unet_p.n_ctx)))
    if use_q4:
        unet_params = synth_q4_params(spec_u, 0)
        n_q = sum(1 for k in unet_params if k.endswith("_q4"))
        log(f"[{name}] {n_q} linear weights synthesized packed-int4 "
            "on device")
    elif use_q8:
        # device-side int8 synthesis (no host round-trip: the 40MB/s
        # host->HBM link would take minutes at sd35-large/flux scale);
        # DiT configs let the cost model pick per-column int8-MXU
        # storage per shape (queue-38)
        from mlimgsynth_tpu.ops.q8_matmul import dit_m_hint
        unet_params = synth_q8_params(
            spec_u, 0,
            percol_m_hint=dit_m_hint(size, size) if flow else None)
        n_q = sum(1 for k in unet_params if k.endswith("_q8"))
        log(f"[{name}] {n_q} linear weights synthesized int8 on device")
    else:
        unet_params = synth_params(spec_u, 0)
    control = None
    if use_cnet:
        from mlimgsynth_tpu.models import controlnet as CN
        label_cn = (jnp.zeros((1, unet_p.ch_adm_in))
                    if unet_p.ch_adm_in else None)

        def _cn(ctx, x, t, c, hint):
            feat = CN.hint_apply(ctx, hint, unet_p)
            return CN.controlnet_apply(ctx, x, t, c, label_cn, feat, unet_p)

        spec_cn = B.trace_spec(
            _cn, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, unet_p.n_ctx)), jnp.zeros((1, 64, 64, 3)))
        unet_params = {**unet_params, **synth_params(spec_cn, 5)}
        rngh = np.random.default_rng(9)
        hint = rngh.random((1, 3, size, size)).astype(np.float32)
        control = (hint, 1.0)
    if use_tae:
        from mlimgsynth_tpu.models import tae as T
        spec_v = B.trace_spec(
            lambda ctx, x: T.tae_decode_apply(ctx, x, T.TAE_SD1),
            jnp.zeros((1, 8, 8, 4)))
    else:
        spec_v = B.trace_spec(
            lambda ctx, x: V.vae_decode_apply(ctx, x, vae_p),
            jnp.zeros((1, 8, 8, vae_p.ch_z)))
    vae_params = synth_params(spec_v, 1)
    venc_params = None
    if use_i2i:
        spec_ve = B.trace_spec(
            lambda ctx, x: V.vae_encode_apply(ctx, x, vae_p),
            jnp.zeros((1, 64, 64, 3)))
        venc_params = synth_params(spec_ve, 4)
    single_label = unet_p.cond_label and clip2_p is None  # sdxl-refiner
    spec_c = B.trace_spec(
        lambda ctx, toks: C.clip_text_apply(
            ctx, toks, clip_p,
            feat_tok_idx=(jnp.zeros((1,), jnp.int32)
                          if single_label or flow else None)),
        jnp.zeros((1, 77), jnp.int32))
    clip_params = (synth_q8_params(spec_c, 2) if use_lowmem
                   else synth_params(spec_c, 2))
    clip2_params = None
    if clip2_p is not None:
        spec_c2 = B.trace_spec(
            lambda ctx, toks: C.clip_text_apply(
                ctx, toks, clip2_p,
                feat_tok_idx=jnp.zeros((1,), jnp.int32), pre="clip2"),
            jnp.zeros((1, 77), jnp.int32))
        clip2_params = (synth_q8_params(spec_c2, 3) if use_lowmem
                        else synth_params(spec_c2, 3))
    log(f"[{name}] weight synthesis {time.time() - t0:.1f}s")

    prompt = "a photograph of an astronaut riding a horse"
    toks = tok.wrap_tokens(clip_p, tok.tokenize(prompt))
    ntoks = tok.wrap_tokens(clip_p, [])
    n_tok = len(tok.tokenize(prompt))
    if use_unipc:
        method = "unipc"
    if use_lcm:
        method = "lcm"
    cfg = SamplerConfig(method=method, sched="uniform", n_step=n_steps,
                        cfg_scale=cfg_scale,
                        pag_scale=(3.0 if use_pag else 0.0),
                        f_t_ini=(0.75 if use_i2i else 1.0),
                        flow_shift=(getattr(unet_p, "flow_shift", 0.0)
                                    if flow else 0.0),
                        slg_scale=(2.5 if use_slg else 0.0),
                        # official 7,8,9 layers, clamped for tiny smokes
                        slg_layers=tuple(
                            l for l in (7, 8, 9)
                            if l < getattr(unet_p, "depth", 0)
                        ) or (max(getattr(unet_p, "depth", 1) // 2, 0),))

    init_latent = np.zeros((n_batch, vae_p.ch_z, lat, lat), np.float32)
    lmask = None
    if use_i2i:
        # synthetic init image + circular alpha mask (the runtime path of
        # BASELINE config 4): encode rides a separate dispatch like the
        # session's image_encode, so it is part of the measured e2e
        from mlimgsynth_tpu.api import _vae_encode_jit
        from mlimgsynth_tpu.utils import image as image_mod
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        init_img = np.stack([xx, yy, 0.5 * (xx + yy)])[None]  # [1,3,H,W]
        r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
        mask = (r2 < 0.3 ** 2).astype(np.float32)[None, None]  # [1,1,H,W]
        lmask = np.repeat(image_mod.mask_downsize(mask, 8), n_batch, 0)

        def encode_init():
            x = init_img * 2.0 - 1.0
            mom = np.asarray(_vae_encode_jit(
                venc_params, x.transpose(0, 2, 3, 1), vae_p=vae_p,
                dtype=dtype), np.float32).transpose(0, 3, 1, 2)
            mean = mom[:, :vae_p.ch_z] * vae_p.scale_factor
            return np.repeat(mean, n_batch, 0).astype(np.float32)

    # cond and uncond ride ONE batched CLIP call (row 0 = prompt, row 1 =
    # empty): halves the text-encode dispatches per generation
    tokpair = np.asarray([toks, ntoks], np.int32)
    featpair = np.asarray([n_tok + 1, 1], np.int32)

    def encode_both():
        single = unet_p.cond_label and clip2_p is None  # sdxl-refiner
        emb, feat1 = _clip_jit(clip_params, tokpair, featpair,
                               clip_p=clip_p, submodel="clip",
                               clip_skip=(2 if single else 1),
                               norm=unet_p.clip_norm, want_feat=single,
                               dtype=dtype)
        emb = np.asarray(emb, np.float32)
        label = nlabel = None
        if single:
            from mlimgsynth_tpu.models.blocks import timestep_embedding
            from mlimgsynth_tpu.models.unet import (AESTHETIC_SCORE,
                                                    AESTHETIC_NSCORE)
            import jax.numpy as jnp2
            sizes = np.asarray(
                [[size, size, 0, 0, AESTHETIC_SCORE],
                 [size, size, 0, 0, AESTHETIC_NSCORE]], np.float32)
            serows = np.asarray(
                timestep_embedding(jnp2.asarray(sizes.reshape(-1)), 256),
                np.float32).reshape(2, -1)
            lab = np.concatenate([np.asarray(feat1, np.float32), serows],
                                 -1)
            label, nlabel = lab[0:1], lab[1:2]
        if clip2_p is not None:
            # one bigG pass returns both skip-2 embeddings and the feature
            emb2, feat = _clip_jit(clip2_params, tokpair, featpair,
                                   clip_p=clip2_p, submodel="clip2",
                                   clip_skip=2, norm=False, want_feat=True,
                                   dtype=dtype)
            emb = np.concatenate([emb, np.asarray(emb2, np.float32)], -1)
            from mlimgsynth_tpu.models.blocks import timestep_embedding
            import jax.numpy as jnp2
            sizes = np.array([size, size, 0, 0, size, size], np.float32)
            se = np.asarray(timestep_embedding(jnp2.asarray(sizes), 256),
                            np.float32).reshape(-1)
            lab = np.concatenate(
                [np.asarray(feat, np.float32), np.tile(se, (2, 1))], -1)
            label, nlabel = lab[0:1], lab[1:2]
        return emb[0:1], emb[1:2], label, nlabel

    # ALL model families fuse the CLIP forward(s) into the loop program:
    # the whole generation is ONE dispatch + ONE u8 fetch (SDXL fuses the
    # bigG tower + feature head + size labels too).  MLIS_BENCH_FUSE=0
    # A/Bs the separate-dispatch path.
    fuse_encode = os.environ.get("MLIS_BENCH_FUSE", "1") != "0"
    # [cond xN ; uncond xN]; cfg<=1 skips the uncond rows entirely
    enc_pair = tokpair if cfg_scale > 1 else tokpair[:1]
    tokrows = np.repeat(enc_pair, n_batch, axis=0)
    wrows = np.ones(tokrows.shape, np.float32)
    enc_extra = ()
    if flow:
        # SD3: both towers' feature heads + zero T5 rows (the no-T5 shape;
        # the rows still participate in joint attention like the real
        # pipelines')
        tok2pair = np.asarray([tok.wrap_tokens(clip2_p, tok.tokenize(prompt)),
                               tok.wrap_tokens(clip2_p, [])], np.int32)
        tok2rows = np.repeat(
            tok2pair if cfg_scale > 1 else tok2pair[:1], n_batch, axis=0)
        fidxrows = np.repeat(
            featpair if cfg_scale > 1 else featpair[:1], n_batch, axis=0)
        t5_rows = np.zeros((tokrows.shape[0], 77, unet_p.d_ctx_in),
                           np.float32)
        enc_extra = (clip2_params, tok2rows, fidxrows, fidxrows.copy(),
                     t5_rows, clip2_p)
    elif clip2_p is not None:
        tok2pair = np.asarray([tok.wrap_tokens(clip2_p, tok.tokenize(prompt)),
                               tok.wrap_tokens(clip2_p, [])], np.int32)
        tok2rows = np.repeat(
            tok2pair if cfg_scale > 1 else tok2pair[:1], n_batch, axis=0)
        fidxrows = np.repeat(
            featpair if cfg_scale > 1 else featpair[:1], n_batch, axis=0)
        from mlimgsynth_tpu.models.blocks import timestep_embedding
        sizes = np.array([size, size, 0, 0, size, size], np.float32)
        size_emb = np.asarray(timestep_embedding(jnp.asarray(sizes), 256),
                              np.float32).reshape(-1)
        enc_extra = (clip2_params, tok2rows, fidxrows, size_emb, clip2_p)
    elif single_label:
        # sdxl-refiner: feature indices + per-row size/aesthetic rows
        from mlimgsynth_tpu.models.blocks import timestep_embedding
        from mlimgsynth_tpu.models.unet import (AESTHETIC_SCORE,
                                                AESTHETIC_NSCORE)
        fidxrows = np.repeat(
            featpair if cfg_scale > 1 else featpair[:1], n_batch, axis=0)
        scores = ([AESTHETIC_SCORE] * n_batch
                  + ([AESTHETIC_NSCORE] * n_batch if cfg_scale > 1 else []))
        sizes = np.asarray([[size, size, 0, 0, s] for s in scores],
                           np.float32)
        serows = np.asarray(
            timestep_embedding(jnp.asarray(sizes.reshape(-1)), 256),
            np.float32).reshape(len(scores), -1)
        enc_extra = (fidxrows, serows)

    t5_fn = None
    if use_t5:
        if not flow:
            raise SystemExit("-t5 bench requires an SD3/flow config")
        from mlimgsynth_tpu.models import t5 as T5M
        P5 = T5M.T5_XXL
        t0 = time.time()
        spec_t5 = B.trace_spec(
            lambda ctx, tk: T5M.t5_encode_apply(ctx, tk, P5),
            jnp.zeros((1, 77), jnp.int32))
        t5_params = synth_q8_params(spec_t5, 3)
        log(f"[{name}] t5-xxl 4.7B int8 synthesized on device "
            f"({len(spec_t5)} tensors, {time.time() - t0:.1f}s)")
        # no t5 tokenizer.json on this box: synthetic token ids with the
        # real EOS/pad layout (perf is id-independent)
        rng5 = np.random.default_rng(11)
        ids = rng5.integers(2, 32000, size=(1, 77)).astype(np.int32)
        ids[0, 20] = T5M.T5_EOS_ID
        ids[0, 21:] = T5M.T5_PAD_ID
        un = np.full((1, 77), T5M.T5_PAD_ID, np.int32)
        un[0, 0] = T5M.T5_EOS_ID
        t5_toks = jnp.asarray(np.repeat(
            np.concatenate([ids, un], 0) if cfg_scale > 1 else ids,
            n_batch, axis=0))

        @jax.jit
        def t5_run(p, tk):
            return T5M.t5_encode_apply(
                B.Ctx(p, dtype=dtype), tk, P5).astype(jnp.float32)

        def t5_fn():
            return t5_run(t5_params, t5_toks)

    def run(seed):
        x0 = encode_init() if use_i2i else init_latent
        plan = make_plan(cfg, (n_batch, vae_p.ch_z, lat, lat),
                         RngPhilox(seed=seed),
                         nfe_per_dxdt=(2 if cfg_scale > 1 else 1))
        # decode fused into the loop program; skip the latent fetch —
        # minimizes host round-trips
        decode = ("tae", vae_params, None) if use_tae \
            else ("vae", vae_params, vae_p)
        if fuse_encode:
            skip = 2 if (clip2_p is not None or single_label) else 1
            ex = enc_extra
            if t5_fn is not None:
                # real T5 rows, computed on device (its dispatch + encode
                # time is part of the measured e2e, like the reference's
                # text-encode stage)
                ex = enc_extra[:4] + (t5_fn(),) + enc_extra[5:]
            encode = (clip_params, tokrows, wrows, clip_p, skip,
                      unet_p.clip_norm) + ex
            if use_lowmem:
                # latent-only loop, then the single-dispatch tiled VAE
                # decode as a SECOND program: the decode workspace never
                # coexists with the denoise loop's temps
                from mlimgsynth_tpu.api import _tiled_decode
                lat_out, _ = run_sampler(
                    unet_params, x0, plan, None, None, None, None, lmask,
                    cfg, unet_p, dtype=dtype, want_latent=True,
                    encode=encode, control=control,
                    deepcache=(3 if use_dc else 0))
                return _tiled_decode(vae_params,
                                     np.asarray(lat_out, np.float32),
                                     vae_p, 512, dtype)
            _, img, _ = run_sampler(
                unet_params, x0, plan, None, None, None, None, lmask,
                cfg, unet_p, dtype=dtype, decode=decode, want_latent=False,
                encode=encode, control=control,
                deepcache=(3 if use_dc else 0))
            return img
        if flow:
            raise RuntimeError("sd3 bench requires the fused-encode path "
                               "(MLIS_BENCH_FUSE=0 unsupported)")
        emb, nemb, label, nlabel = encode_both()
        if n_batch > 1:
            emb = np.repeat(emb, n_batch, 0)
            nemb = np.repeat(nemb, n_batch, 0)
            label = np.repeat(label, n_batch, 0) if label is not None \
                else None
            nlabel = np.repeat(nlabel, n_batch, 0) if nlabel is not None \
                else None
        _, img = run_sampler(unet_params, x0,
                             plan, emb, nemb, label, nlabel, lmask,
                             cfg, unet_p, dtype=dtype, decode=decode,
                             want_latent=False, control=control)
        return img

    def run_hires(seed):
        """Two-pass enable_hr shape: base loop (latent-only, fused
        encode), bilinear latent 2x, img2img refine loop + fused decode
        at 2x resolution.  Host touches one latent between stages."""
        import dataclasses

        import jax
        encode = (clip_params, tokrows, wrows, clip_p, 1,
                  unet_p.clip_norm)
        plan1 = make_plan(cfg, (n_batch, vae_p.ch_z, lat, lat),
                          RngPhilox(seed=seed),
                          nfe_per_dxdt=(2 if cfg_scale > 1 else 1))
        lat1, _ = run_sampler(unet_params, init_latent, plan1, None, None,
                              None, None, None, cfg, unet_p, dtype=dtype,
                              encode=encode, want_latent=True)
        lat2 = np.asarray(jax.image.resize(
            jnp.asarray(np.asarray(lat1, np.float32)),
            (n_batch, vae_p.ch_z, lat * 2, lat * 2), "bilinear"),
            np.float32)
        cfg2 = dataclasses.replace(cfg, f_t_ini=0.7)
        plan2 = make_plan(cfg2, lat2.shape, RngPhilox(seed=seed),
                          nfe_per_dxdt=(2 if cfg_scale > 1 else 1))
        _, img, _ = run_sampler(unet_params, lat2, plan2, None, None,
                                None, None, None, cfg2, unet_p,
                                dtype=dtype,
                                decode=("vae", vae_params, vae_p),
                                want_latent=False, encode=encode)
        return img

    if use_hires:
        run = run_hires

    t0 = time.time()
    os.environ["MLIS_MEM_ANALYSIS"] = "1"   # only on the compile run: the
    img = run(42)                           # AOT lower adds ~2s host time
    os.environ.pop("MLIS_MEM_ANALYSIS", None)
    log(f"[{name}] compile+first-run {time.time() - t0:.1f}s; "
        f"finite: {np.isfinite(img).all()}")

    times = []
    for i in range(3):
        t0 = time.time()
        run(42 + i)
        times.append(time.time() - t0)
        log(f"[{name}] run {i}: {times[-1]:.3f}s")
    best = min(times)
    # Memory: runtime memory_stats are unavailable through the remote TPU
    # tunnel, so report the compiled sampling-loop executable's footprint
    # (arguments = weights + noise, temps = activation workspace).
    try:
        st = jax.devices()[0].memory_stats() or {}
        peak = st.get("peak_bytes_in_use", 0)
        if peak:
            log(f"[{name}] peak HBM {peak / 1024**3:.2f} GiB")
    except Exception:
        peak = 0
    from mlimgsynth_tpu.sampling import sampler as _sampler
    ma = getattr(_sampler, "LAST_MEMORY_ANALYSIS", None)
    peak_gib = None
    if ma:
        log(f"[{name}] compiled loop memory: args "
            f"{ma['argument_bytes'] / 1024**3:.2f} GiB + temps "
            f"{ma['temp_bytes'] / 1024**3:.2f} GiB = "
            f"{ma['peak_estimate_bytes'] / 1024**3:.2f} GiB "
            f"(reference claims SDXL <= 4 GiB with unet-split+vae-tile)")
    if use_lowmem and ma:
        # Two-program peak: while the latent-only loop runs, the VAE
        # weights (device-resident, not loop args) coexist with it; while
        # the tiled decode runs, the loop's weights stay resident.  The
        # claim peak is the max of the two phases.
        import mlimgsynth_tpu.api as _api
        dma = getattr(_api, "LAST_DECODE_MEMORY_ANALYSIS", None)
        vae_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                        for v in vae_params.values())
        if dma:
            log(f"[{name}] tiled decode memory: args "
                f"{dma['argument_bytes'] / 1024**3:.2f} GiB + temps "
                f"{dma['temp_bytes'] / 1024**3:.2f} GiB + out "
                f"{dma['output_bytes'] / 1024**3:.2f} GiB")
            p1 = ma["peak_estimate_bytes"] + vae_bytes
            p2 = ma["argument_bytes"] + dma["peak_estimate_bytes"]
            peak_gib = round(max(p1, p2) / 1024**3, 3)
            log(f"[{name}] lowmem phase peaks: loop+vae "
                f"{p1 / 1024**3:.2f} GiB, weights+decode "
                f"{p2 / 1024**3:.2f} GiB -> claim peak {peak_gib:.2f} GiB "
                f"(reference SDXL claim: <= 4 GiB)")
    label = {"sdxl": "SDXL", "sd21": "SD2.1 dpm++2m vparam",
             "sd15-tae": "SD1.5+TAE",
             "sdxl-refiner": "SDXL-refiner",
             "sd3": "SD3-medium MMDiT flow",
             "sd35-medium": "SD3.5-medium MMDiT-X flow",
             "sd35-large": "SD3.5-large 8B MMDiT flow"}.get(name_base,
                                                            "SD1.5")
    if use_cnet:
        label += " +ControlNet"
    if use_i2i:
        label += " img2img+inpaint"
    if use_hires:
        label += f" highres-fix {size}->{size * 2}px"
    if use_dc:
        label += " deepcache3"
    if use_t5:
        label += " +T5-XXL-int8"
    if use_slg:
        label += " slg2.5"
    if use_pag:
        label += " pag3"
    if use_unipc:
        label += " unipc"
    if use_lcm:
        label += " lcm4"
    if use_lowmem:
        label += " lowmem(int4-unet+int8-clip+tiled-vae)"
    elif use_q4:
        label += " int4-weights"
    elif use_q8:
        label += " int8-weights"
    if use_turbo:
        label += " turbo-style"
    if n_batch > 1:
        label += f" batch{n_batch} throughput"
    out = {
        "metric": f"{label} {size}px "
                  f"{n_steps}-step cfg{cfg_scale:g} txt2img e2e latency "
                  "(text encode + denoise + decode)",
        "value": round(best / n_batch, 4),
        "unit": "s/image",
        "vs_baseline": round(baseline / (best / n_batch), 3),
    }
    if peak_gib is not None:
        out["peak_gib"] = peak_gib
    return out


def bench_flux(name):
    """Flux.1 e2e (beyond-reference family): 12B double/single-stream DiT
    at 1024px, int8 weight-only (the only way it fits one v5e chip:
    ~11.7 GiB weights + VAE/CLIP + activations), T5-shape zero context
    (256 rows), fused pooled-clip encode.  flux-schnell: 4 steps cfg 1
    (distilled); flux-dev: 20 steps embedded guidance 3.5 (1 NFE/step)."""
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import clip as C
    from mlimgsynth_tpu.models import flux as FX
    from mlimgsynth_tpu.models import vae as V
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)
    from mlimgsynth_tpu import tokenizer as tok

    use_dc = name.endswith("-dc")
    name_base = name[:-3] if use_dc else name
    dev = name_base == "flux-dev"
    P = FX.FLUX_DEV if dev else FX.FLUX_SCHNELL
    clip_p, vae_p = C.CLIP_VIT_L_14, V.VAE_FLUX
    size, baseline = 1024, 4.0
    size = int(os.environ.get("MLIS_BENCH_SIZE") or size)
    lat = size // 8
    n_steps = 20 if dev else 4
    guidance = 3.5
    dtype = jnp.bfloat16
    s_t5 = 256

    t0 = time.time()
    spec_u = B.trace_spec(
        lambda ctx, x, t, c, y: FX.flux_apply(
            ctx, x, t, c, y, P,
            guidance=(jnp.zeros((1,)) if P.guidance_embed else None)),
        jnp.zeros((1, 8, 8, P.n_ch_in // 4)), jnp.zeros((1,)),
        jnp.zeros((1, s_t5, P.d_ctx_in)), jnp.zeros((1, P.d_pooled)))
    if os.environ.get("MLIS_FLUX_Q4"):
        unet_params = synth_q4_params(spec_u, 0)   # ~6.2 GiB resident
    else:
        from mlimgsynth_tpu.ops.q8_matmul import dit_m_hint
        unet_params = synth_q8_params(
            spec_u, 0, percol_m_hint=dit_m_hint(size, size, flux=True))
    spec_v = B.trace_spec(
        lambda ctx, x: V.vae_decode_apply(ctx, x, vae_p),
        jnp.zeros((1, 8, 8, vae_p.ch_z)))
    vae_params = synth_params(spec_v, 1)
    spec_c = B.trace_spec(
        lambda ctx, toks: C.clip_text_apply(
            ctx, toks, clip_p, feat_tok_idx=jnp.zeros((1,), jnp.int32),
            feat_proj=False),
        jnp.zeros((1, 77), jnp.int32))
    clip_params = synth_params(spec_c, 2)
    log(f"[{name}] weight synthesis {time.time() - t0:.1f}s")

    prompt = "a photograph of an astronaut riding a horse"
    toks = tok.wrap_tokens(clip_p, tok.tokenize(prompt))
    n_tok = len(tok.tokenize(prompt))
    tokrows = np.asarray([toks], np.int32)
    wrows = np.ones(tokrows.shape, np.float32)
    fidx = np.asarray([n_tok + 1], np.int32)
    t5_rows = np.zeros((1, s_t5, P.d_ctx_in), np.float32)
    grow = (np.full((1, 1), guidance, np.float32) if P.guidance_embed
            else None)
    encode = (clip_params, tokrows, wrows, clip_p, 1, False,
              fidx, t5_rows, grow)
    cfg = SamplerConfig(
        method="euler", sched="uniform", n_step=n_steps, cfg_scale=1.0,
        flow_shift=(FX.dynamic_flow_shift(P, lat, lat) if dev else 1.0))
    init_latent = np.zeros((1, vae_p.ch_z, lat, lat), np.float32)

    def run(seed):
        plan = make_plan(cfg, init_latent.shape, RngPhilox(seed=seed),
                         nfe_per_dxdt=1)
        _, img, _ = run_sampler(
            unet_params, init_latent, plan, None, None, None, None, None,
            cfg, P, dtype=dtype, decode=("vae", vae_params, vae_p),
            want_latent=False, encode=encode,
            deepcache=(3 if use_dc else 0))
        return img

    t0 = time.time()
    os.environ["MLIS_MEM_ANALYSIS"] = "1"
    img = run(42)
    os.environ.pop("MLIS_MEM_ANALYSIS", None)
    log(f"[{name}] compile+first-run {time.time() - t0:.1f}s; "
        f"finite: {np.isfinite(img).all()}")
    times = []
    for i in range(3):
        t0 = time.time()
        run(42 + i)
        times.append(time.time() - t0)
        log(f"[{name}] run {i}: {times[-1]:.3f}s")
    best = min(times)
    from mlimgsynth_tpu.sampling import sampler as _sampler
    ma = getattr(_sampler, "LAST_MEMORY_ANALYSIS", None)
    if ma:
        log(f"[{name}] compiled loop memory: args "
            f"{ma['argument_bytes'] / 1024**3:.2f} GiB + temps "
            f"{ma['temp_bytes'] / 1024**3:.2f} GiB")
    qtier = "int4" if os.environ.get("MLIS_FLUX_Q4") else "int8"
    label = (f"Flux.1-dev 12B {qtier} guidance-embedded" if dev
             else f"Flux.1-schnell 12B {qtier} distilled")
    if use_dc:
        label += " deepcache3"
    return {
        "metric": f"{label} {size}px {n_steps}-step txt2img e2e latency "
                  "(text encode + denoise + decode)",
        "value": round(best, 4),
        "unit": "s/image",
        "vs_baseline": round(baseline / best, 3),
    }


def bench_esrgan(name):
    """Real-ESRGAN x4 upscale (RRDBNet x4plus geometry: 23 RRDB blocks,
    64 features — models/esrgan.py), synthetic weights: one-dispatch
    512->2048px upscale, the kernel behind session.upscale(), the
    `upscale` CLI command and the A1111 hr_upscaler/extras paths.
    Reports the on-device compute time (tiny-slice completion barrier)
    AND the full-image e2e (the 2048px u8 fetch pays the tunnel's
    ~40 MB/s, which a directly-attached chip would not)."""
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import esrgan as E

    P = E.ESRGAN_X4
    size = int(os.environ.get("MLIS_BENCH_SIZE") or 512)
    dtype = jnp.bfloat16
    t0 = time.time()
    spec = B.trace_spec(
        lambda ctx, x: E.esrgan_apply(ctx, x, P),
        jnp.zeros((1, size, size, 3)))
    # RRDBNet has NO normalization layers: unit-gain random convs explode
    # through 23 residual blocks in bf16.  gain 0.3 keeps the synthetic
    # forward finite (measured; real checkpoints are trained stable).
    params = synth_params(spec, 0, gain=0.3)
    log(f"[{name}] weight synthesis {time.time() - t0:.1f}s "
        f"({len(spec)} tensors)")

    @jax.jit
    def up(p, x):
        img = E.esrgan_apply(B.Ctx(p, dtype=dtype), x, P).astype(
            jnp.float32)
        u8 = (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return u8, jnp.isfinite(img).all()

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, size, size, 3)).astype(np.float32))
    t0 = time.time()
    out, fin = up(params, x)
    out = np.asarray(out)
    log(f"[{name}] compile+first-run {time.time() - t0:.1f}s; "
        f"out {out.shape}; finite: {bool(fin)}")
    t_dev, t_e2e = [], []
    for i in range(3):
        t0 = time.time()
        np.asarray(up(params, x)[0][0, :4, :4])   # tiny-slice barrier
        t_dev.append(time.time() - t0)
        t0 = time.time()
        np.asarray(up(params, x)[0])
        t_e2e.append(time.time() - t0)
        log(f"[{name}] run {i}: device {t_dev[-1]:.3f}s / "
            f"e2e+fetch {t_e2e[-1]:.3f}s")
    best = min(t_dev)
    return {
        "metric": f"Real-ESRGAN x4 RRDBNet {size}->{size * P.scale}px "
                  "upscale on-device latency",
        "value": round(best, 4),
        "unit": "s/image",
        "vs_baseline": round(4.0 / best, 3),
    }


def bench_ensemble(name):
    """SDXL base + refiner ensemble (the product path run by
    api._refiner_generate / --refiner): stage 1 denoises [1.0 .. 0.2]
    with keep_tail (no decode, latent handoff), stage 2 continues from
    the exact same sigma with noise_add=False and decodes.  Both UNets
    stay resident; the bigG tower weights are shared between the base's
    clip2 and the refiner's single tower (same arrays, renamed)."""
    import jax
    import jax.numpy as jnp
    from mlimgsynth_tpu.models import blocks as B
    from mlimgsynth_tpu.models import clip as C
    from mlimgsynth_tpu.models import unet as U
    from mlimgsynth_tpu.models import vae as V
    from mlimgsynth_tpu.models.blocks import timestep_embedding
    from mlimgsynth_tpu.models.unet import AESTHETIC_SCORE, AESTHETIC_NSCORE
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)
    from mlimgsynth_tpu import tokenizer as tok

    size, baseline, switch = 1024, 4.0, 0.8
    f_cut = 1.0 - switch
    lat = size // 8
    dtype = jnp.bfloat16
    base_p, ref_p = U.UNET_SDXL, U.UNET_SDXL_REFINER
    clip_p, clip2_p, vae_p = C.CLIP_VIT_L_14, C.CLIP_VIT_BIGG_14, V.VAE_SDXL

    t0 = time.time()

    def unet_spec(p):
        return B.trace_spec(
            lambda ctx, x, t, c: U.unet_apply(
                ctx, x, t, c, jnp.zeros((1, p.ch_adm_in)), p),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, p.n_ctx)))

    base_params = synth_params(unet_spec(base_p), 0)
    ref_params = synth_params(unet_spec(ref_p), 7)
    vae_params = synth_params(B.trace_spec(
        lambda ctx, x: V.vae_decode_apply(ctx, x, vae_p),
        jnp.zeros((1, 8, 8, 4))), 1)
    clip_params = synth_params(B.trace_spec(
        lambda ctx, toks: C.clip_text_apply(ctx, toks, clip_p),
        jnp.zeros((1, 77), jnp.int32)), 2)
    clip2_params = synth_params(B.trace_spec(
        lambda ctx, toks: C.clip_text_apply(
            ctx, toks, clip2_p, feat_tok_idx=jnp.zeros((1,), jnp.int32),
            pre="clip2"),
        jnp.zeros((1, 77), jnp.int32)), 3)
    # the refiner's tower rides the SAME device buffers under "clip." names
    ref_tower = {k.replace("clip2.", "clip.", 1): v
                 for k, v in clip2_params.items()}
    log(f"[{name}] weight synthesis {time.time() - t0:.1f}s")

    prompt = "a photograph of an astronaut riding a horse"
    toks1 = tok.wrap_tokens(clip_p, tok.tokenize(prompt))
    ntoks1 = tok.wrap_tokens(clip_p, [])
    toks2 = tok.wrap_tokens(clip2_p, tok.tokenize(prompt))
    ntoks2 = tok.wrap_tokens(clip2_p, [])
    n_tok = len(tok.tokenize(prompt))
    tokrows1 = np.asarray([toks1, ntoks1], np.int32)
    tokrows2 = np.asarray([toks2, ntoks2], np.int32)
    wrows = np.ones(tokrows1.shape, np.float32)
    fidx = np.asarray([n_tok + 1, 1], np.int32)
    sizes = np.array([size, size, 0, 0, size, size], np.float32)
    size_emb = np.asarray(timestep_embedding(jnp.asarray(sizes), 256),
                          np.float32).reshape(-1)
    enc_base = (clip_params, tokrows1, wrows, clip_p, 2, base_p.clip_norm,
                clip2_params, tokrows2, fidx, size_emb, clip2_p)
    aes = np.asarray([[size, size, 0, 0, AESTHETIC_SCORE],
                      [size, size, 0, 0, AESTHETIC_NSCORE]], np.float32)
    serows = np.asarray(
        timestep_embedding(jnp.asarray(aes.reshape(-1)), 256),
        np.float32).reshape(2, -1)
    enc_ref = (ref_tower, tokrows2, wrows, clip2_p, 2, ref_p.clip_norm,
               fidx, serows)

    cfg1 = SamplerConfig(method="euler", sched="uniform", n_step=STEPS,
                         cfg_scale=CFG, f_t_end=f_cut, keep_tail=True)
    cfg2 = SamplerConfig(method="euler", sched="uniform", n_step=STEPS,
                         cfg_scale=CFG, f_t_ini=f_cut, noise_add=False)
    init_latent = np.zeros((1, 4, lat, lat), np.float32)

    def run(seed):
        rng = RngPhilox(seed=seed)
        plan1 = make_plan(cfg1, init_latent.shape, rng, nfe_per_dxdt=2)
        hand = run_sampler(base_params, init_latent, plan1, None, None,
                           None, None, None, cfg1, base_p, dtype=dtype,
                           encode=enc_base)
        lat2, _ = hand if isinstance(hand, tuple) else (hand, None)
        plan2 = make_plan(cfg2, init_latent.shape, rng, nfe_per_dxdt=2)
        _, img, _ = run_sampler(ref_params, np.asarray(lat2, np.float32),
                                plan2, None, None, None, None, None, cfg2,
                                ref_p, dtype=dtype,
                                decode=("vae", vae_params, vae_p),
                                want_latent=False, encode=enc_ref)
        return plan1.n_step, plan2.n_step, img

    t0 = time.time()
    n1, n2, img = run(42)
    log(f"[{name}] compile+first-run {time.time() - t0:.1f}s; "
        f"steps {n1}+{n2}; finite: {np.isfinite(img).all()}")
    times = []
    for i in range(3):
        t0 = time.time()
        run(42 + i)
        times.append(time.time() - t0)
        log(f"[{name}] run {i}: {times[-1]:.3f}s")
    best = min(times)
    return {
        "metric": f"SDXL base+refiner ensemble {size}px {n1}+{n2}-step "
                  f"cfg{CFG:g} switch {switch:g} txt2img e2e latency "
                  "(text encode + denoise + handoff + refine + decode)",
        "value": round(best, 4),
        "unit": "s/image",
        "vs_baseline": round(baseline / best, 3),
    }


def _wait_for_backend(max_wait_s: float):
    """Bounded wait for the TPU relay: the axon tunnel has multi-hour outage
    windows (dials fail fast with "Unable to initialize backend 'axon'" or
    hang on TCP recv).  Probe in a SUBPROCESS so a failed/hung dial can't
    poison this process's jax backend state; proceed on first success."""
    import subprocess
    import sys
    import time
    if max_wait_s <= 0:       # MLIS_BENCH_WAIT=0: skip the probe dial
        return
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=600)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            raise RuntimeError(
                f"TPU backend unavailable after {max_wait_s:.0f}s "
                f"({attempt} probes) — relay outage")
        log(f"backend probe {attempt} failed (relay outage?); retrying in 300s")
        time.sleep(300)


def main():
    _wait_for_backend(float(os.environ.get("MLIS_BENCH_WAIT", "3600")))
    import jax
    from mlimgsynth_tpu.utils.compcache import enable as _cc
    _cc()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    # no-env default (the driver's invocation) runs BOTH flagships so the
    # round record carries the UNet and the SDXL number (round-4 weak #6)
    which = os.environ.get("MLIS_BENCH", "sd15,sdxl")
    configs = (["sd15", "sdxl", "sd21", "sd15-tae", "sd15-i2i"]
               if which == "all" else which.split(","))
    results = []
    for c in configs:
        # No scoped-VMEM retry: planner v3.2 picks provably-safe blocks
        # (10/10 fresh scanned compiles clean, docs/BENCH.md queue #8).
        if c == "sdxl-ens":
            results.append(bench_ensemble(c))
        elif c.startswith("flux-"):
            results.append(bench_flux(c))
        elif c.startswith("esrgan"):
            results.append(bench_esrgan(c))
        else:
            results.append(bench_config(c))
    for r in results[1:]:
        log(json.dumps(r))
    out = dict(results[0])
    if len(results) > 1:
        # keep the one-JSON-line driver contract; secondary configs ride
        # inside the primary record
        out["extra"] = results[1:]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
