import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import clip as clip_mod
from mlimgsynth_tpu.models import tae as tae_mod
from mlimgsynth_tpu.models import unet as unet_mod
from mlimgsynth_tpu.models import vae as vae_mod


def n_params(spec):
    return sum(int(np.prod(s.shape)) for s in spec.values())


def test_unet_sd1_param_count():
    # SD v1 UNet has exactly 859,520,964 parameters (public number)
    spec = B.trace_spec(
        lambda ctx, x, t, c: unet_mod.unet_apply(
            ctx, x, t, c, None, unet_mod.UNET_SD1),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 77, 768)))
    assert n_params(spec) == 859_520_964
    # spot-check key names exist with the right shapes
    assert spec["unet.in.1.1.transf.0.attn2.k_proj.weight"].shape == (768, 320)
    assert spec["unet.in.conv.weight"].shape == (3, 3, 4, 320)
    assert spec["unet.out.conv.weight"].shape == (3, 3, 320, 4)
    assert spec["unet.mid.1.proj_out.weight"].shape == (1, 1, 1280, 1280)
    assert "unet.label_embed.0.weight" not in spec


def test_unet_sdxl_param_count():
    # SDXL base UNet: 2,567,463,684 params
    spec = B.trace_spec(
        lambda ctx, x, t, c, l: unet_mod.unet_apply(
            ctx, x, t, c, l, unet_mod.UNET_SDXL),
        jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 2048)), jnp.zeros((1, 2816)))
    assert n_params(spec) == 2_567_463_684
    assert spec["unet.label_embed.0.weight"].shape == (2816, 1280)
    assert spec["unet.in.4.1.transf.0.attn2.k_proj.weight"].shape == (2048, 640)
    # SDXL level 2 has 10 transformer depth
    assert "unet.mid.1.transf.9.attn1.q_proj.weight" in spec
    assert "unet.mid.1.transf.10.attn1.q_proj.weight" not in spec


def test_clip_l_param_count():
    spec = B.trace_spec(
        lambda ctx, toks: clip_mod.clip_text_apply(
            ctx, toks, clip_mod.CLIP_VIT_L_14),
        jnp.zeros((1, 77), jnp.int32))
    # CLIP ViT-L/14 text tower: 123,060,480 params (public number)
    assert n_params(spec) == 123_060_480


def test_vae_spec_structure():
    spec = B.trace_spec(
        lambda ctx, x: vae_mod.vae_decode_apply(ctx, x, vae_mod.VAE_SD1),
        jnp.zeros((1, 8, 8, 4)))
    assert spec["vae.post_quant_conv.weight"].shape == (1, 1, 4, 4)
    assert spec["vae.decoder.conv_in.weight"].shape == (3, 3, 4, 512)
    assert spec["vae.decoder.up.3.block.0.norm1.weight"].shape == (512,)
    assert spec["vae.decoder.conv_out.weight"].shape == (3, 3, 128, 3)
    # decoder + post_quant_conv of the SD VAE: 49,490,199 (public number)
    assert n_params(spec) == 49_490_199
    spec_e = B.trace_spec(
        lambda ctx, x: vae_mod.vae_encode_apply(ctx, x, vae_mod.VAE_SD1),
        jnp.zeros((1, 64, 64, 3)))
    # encoder alone: 34,163,592 (public number); quant_conv adds 72
    enc = {k: v for k, v in spec_e.items() if k.startswith("vae.encoder.")}
    assert n_params(enc) == 34_163_592
    assert n_params(spec_e) == 34_163_592 + 72


def test_tae_spec_structure():
    spec = B.trace_spec(
        lambda ctx, x: tae_mod.tae_decode_apply(ctx, x, tae_mod.TAE_SD1),
        jnp.zeros((1, 8, 8, 4)))
    assert "tae.decoder.layers.0.weight" in spec
    # final conv of the decoder produces 3 channels
    last = max(int(k.split(".")[3]) for k in spec
               if k.startswith("tae.decoder.layers."))
    assert spec[f"tae.decoder.layers.{last}.weight"].shape[-1] == 3
    spec_e = B.trace_spec(
        lambda ctx, x: tae_mod.tae_encode_apply(ctx, x, tae_mod.TAE_SD1),
        jnp.zeros((1, 64, 64, 3)))
    assert spec_e["tae.encoder.layers.0.weight"].shape == (3, 3, 3, 64)
    last_e = max(int(k.split(".")[3]) for k in spec_e
                 if k.startswith("tae.encoder.layers."))
    assert spec_e[f"tae.encoder.layers.{last_e}.weight"].shape[-1] == 4


def random_params(spec, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return {
        name: jnp.asarray(
            rng.standard_normal(ps.shape).astype(np.float32) * scale,
            dtype=ps.dtype)
        for name, ps in spec.items()
    }


TINY = unet_mod.UnetParams(
    n_ch=32, ch_mult=(1, 2), transf_depth=(1, 1), attn_res=(1, 2),
    n_head=4, n_te=64, n_ctx=32)


def test_tiny_unet_forward():
    def f(ctx, x, t, c):
        return unet_mod.unet_apply(ctx, x, t, c, None, TINY)

    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.full((2,), 500.0)
    c = jnp.zeros((2, 7, 32))
    spec = B.trace_spec(f, x, t, c)
    params = random_params(spec)
    ctx = B.Ctx(params, dtype=jnp.float32)
    out = f(ctx, x, t, c)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_tiny_vae_roundtrip_shapes():
    P = vae_mod.VaeParams(ch=32, ch_mult=(1, 1, 2, 2))
    img = jnp.zeros((1, 32, 32, 3))
    spec = B.trace_spec(
        lambda ctx, x: vae_mod.vae_encode_apply(ctx, x, P), img)
    params = random_params(spec)
    ctx = B.Ctx(params, dtype=jnp.float32)
    mom = vae_mod.vae_encode_apply(ctx, img, P)
    assert mom.shape == (1, 4, 4, 8)
    lat = vae_mod.latent_sample(mom, jnp.zeros((1, 4, 4, 4)), P)
    spec_d = B.trace_spec(
        lambda ctx, x: vae_mod.vae_decode_apply(ctx, x, P), lat)
    ctx_d = B.Ctx(random_params(spec_d, 1), dtype=jnp.float32)
    out = vae_mod.vae_decode_apply(ctx_d, lat, P)
    assert out.shape == (1, 32, 32, 3)


def test_sampler_loop_tiny():
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)

    def f(ctx, x, t, c):
        return unet_mod.unet_apply(ctx, x, t, c, None, TINY)

    spec = B.trace_spec(f, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                        jnp.zeros((1, 7, 32)))
    params = random_params(spec)
    cfg = SamplerConfig(method="euler", n_step=3, cfg_scale=7.0)
    plan = make_plan(cfg, (1, 4, 8, 8), RngPhilox(seed=42), nfe_per_dxdt=2)
    assert plan.n_step == 3
    cond = jnp.zeros((1, 7, 32))
    uncond = jnp.ones((1, 7, 32)) * 0.1
    x = run_sampler(params, np.zeros((1, 4, 8, 8), np.float32), plan,
                    cond, uncond, None, None, None, cfg, TINY,
                    dtype=jnp.float32)
    x = np.asarray(x)
    assert x.shape == (1, 4, 8, 8)
    assert np.isfinite(x).all()


@pytest.mark.parametrize("method", ["euler", "heun", "dpmpp2m", "dpmpp2s",
                                    "taylor3", "dpmpp2m_sde"])
def test_sampler_all_methods(method):
    from mlimgsynth_tpu.rng import RngPhilox
    from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                                 run_sampler)

    def f(ctx, x, t, c):
        return unet_mod.unet_apply(ctx, x, t, c, None, TINY)

    spec = B.trace_spec(f, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                        jnp.zeros((1, 7, 32)))
    params = random_params(spec)
    cfg = SamplerConfig(method=method, n_step=4, cfg_scale=1.0,
                        s_ancestral=1.0 if method == "dpmpp2s" else 0.0)
    plan = make_plan(cfg, (1, 4, 8, 8), RngPhilox(seed=1))
    cond = jnp.zeros((1, 7, 32))
    x = run_sampler(params, np.zeros((1, 4, 8, 8), np.float32), plan,
                    cond, None, None, None, None, cfg, TINY,
                    dtype=jnp.float32)
    assert np.isfinite(np.asarray(x)).all()
