"""SD3 (MMDiT rectified-flow) family: schedule, sampler wiring, session e2e.

The MMDiT forward itself is parity-tested against torch in test_mmdit.py;
here the tiny sd3 checkpoint exercises the single-file SD3 layout
(text_encoders.clip_l/clip_g HF towers with Linear-stored text_projection,
model.diffusion_model MMDiT tails, 4-ch flow VAE without quant convs),
model identification, the flow schedule math, and the sampler's flow mode
(x interpolated toward noise, t = sigma * 1000, velocity Euler steps)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth, MlisError
from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import mmdit as mmdit_mod
from mlimgsynth_tpu.sampling import schedule as sch
from mlimgsynth_tpu.sampling.sampler import (SamplerConfig, make_plan,
                                             run_sampler)
from mlimgsynth_tpu.rng import RngPhilox
from mlimgsynth_tpu.testing import (TINY_MMDIT, TINY_MODEL_TYPE_SD3,
                                    write_checkpoint_sd3)
from helpers import patch_tiny_model_types


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-sd3.safetensors"
    write_checkpoint_sd3(path)
    return str(path)


@pytest.fixture
def session(ckpt, monkeypatch):
    patch_tiny_model_types(monkeypatch, {"sd3": TINY_MODEL_TYPE_SD3})
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", ckpt)
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 3)
    s.option_set("seed", 42)
    return s


def test_flow_schedule_closed_form():
    """Uniform flow schedule matches the analytic shifted sigmas."""
    shift = 3.0
    ls = sch.log_sigmas_flow(shift)
    s = sch.make_schedule(5, sch.SCHED_UNIFORM, log_sigmas=ls)
    assert s.sigmas[-1] == 0.0
    ts = np.linspace(999.0, 0.0, 5)
    u = (ts + 1.0) / 1000.0
    want = shift * u / (1.0 + (shift - 1.0) * u)
    np.testing.assert_allclose(s.sigmas[:5], want, rtol=3e-5)
    assert abs(s.sigmas[0] - 1.0) < 1e-6  # starts at pure noise
    assert np.all(np.diff(s.sigmas) < 0)


def test_flow_plan_t_is_sigma():
    """For flow models the model timestep is sigma * n_step_train."""
    cfg = SamplerConfig(method="euler", n_step=4, cfg_scale=1.0,
                        flow_shift=3.0)
    plan = make_plan(cfg, (1, 4, 8, 8), RngPhilox(1))
    assert plan.log_sigmas is not None
    # lcm has no flow definition
    with pytest.raises(ValueError):
        make_plan(SamplerConfig(method="lcm", n_step=4, flow_shift=3.0),
                  (1, 4, 8, 8), RngPhilox(1))


def test_sampler_flow_euler_matches_manual(session):
    """run_sampler's flow mode == a hand-rolled host loop: interpolated
    initial state, t = sigma*1000, CFG-mixed velocity Euler updates."""
    session.setup()
    params = session._get_params("unet")
    P = TINY_MMDIT
    rng = np.random.default_rng(3)
    cond = rng.standard_normal((1, 10, P.d_ctx_in)).astype(np.float32) * 0.2
    ncond = rng.standard_normal((1, 10, P.d_ctx_in)).astype(np.float32) * 0.2
    pooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.2
    npooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.2
    x0 = rng.standard_normal((1, P.n_ch_in, 8, 8)).astype(np.float32)

    cfg = SamplerConfig(method="euler", n_step=3, cfg_scale=4.0,
                        f_t_ini=0.7, flow_shift=3.0)
    plan = make_plan(cfg, x0.shape, RngPhilox(42))
    got = run_sampler(params, x0, plan, cond, ncond, pooled, npooled,
                      None, cfg, P, dtype=jnp.float32)

    # manual loop (NHWC on the jax forward, NCHW bookkeeping)
    ctx = B.Ctx(params, dtype=jnp.float32)

    def vel(x_nchw, sigma):
        t = jnp.full((1,), sigma * P.n_step_train, jnp.float32)
        xh = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        vc = np.asarray(mmdit_mod.mmdit_apply(
            ctx, xh, t, jnp.asarray(cond), jnp.asarray(pooled), P),
            np.float32)
        vu = np.asarray(mmdit_mod.mmdit_apply(
            ctx, xh, t, jnp.asarray(ncond), jnp.asarray(npooled), P),
            np.float32)
        v = cfg.cfg_scale * vc + (1.0 - cfg.cfg_scale) * vu
        return v.transpose(0, 3, 1, 2)

    sig = plan.sigmas
    x = x0 * (1.0 - sig[0]) + plan.noise0 * sig[0]
    for i in range(plan.n_step):
        x = x + vel(x, float(sig[i])) * (float(sig[i + 1]) - float(sig[i]))
    np.testing.assert_allclose(got, x, atol=2e-4,
                               err_msg="flow euler trajectory mismatch")


def test_identify_sd3(session):
    """The tiny sd3 file identifies as sd3 from the MMDiT qkv probe."""
    session.setup()
    assert session.c["model_type"] == "sd3"


def test_txt2img_sd3(session):
    session.option_set("prompt", "a flow-matched cat")
    session.option_set("cfg-scale", 4.0)
    img = session.generate()
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()
    assert "a flow-matched cat" in session.infotext


def test_txt2img_sd3_reproducible(session):
    session.option_set("prompt", "a dog")
    a = session.generate()
    session.option_set("seed", 42)
    session.option_set("prompt", "a dog")
    b = session.generate()
    np.testing.assert_array_equal(a, b)


def test_img2img_sd3(session):
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    session.option_set("image", img)
    session.option_set("f-t-ini", 0.6)
    session.option_set("prompt", "more cats")
    out = session.generate()
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(out).all()
    assert "Mode: img2img" in session.infotext


def test_sd3_kohya_lora(ckpt, monkeypatch, tmp_path):
    """kohya SD3 LoRA names (lora_unet_joint_blocks_N_x_block_...) patch
    the MMDiT's fused linears through the session lora option."""
    from safetensors.numpy import save_file

    P = TINY_MMDIT
    rng = np.random.default_rng(5)
    rank, d = 2, P.d_model

    def pair(base, in_d, out_d):
        return {
            f"{base}.lora_down.weight":
                (rng.standard_normal((rank, in_d)) * 0.2).astype(np.float32),
            f"{base}.lora_up.weight":
                (rng.standard_normal((out_d, rank)) * 0.2).astype(np.float32),
            f"{base}.alpha": np.array(4.0, np.float32),
        }

    arrays = {}
    arrays.update(pair("lora_unet_joint_blocks_0_x_block_attn_qkv",
                       d, 3 * d))
    arrays.update(pair("lora_unet_joint_blocks_0_context_block_mlp_fc2",
                       4 * d, d))
    lora_path = tmp_path / "sd3-style.safetensors"
    save_file(arrays, str(lora_path))

    def make():
        patch_tiny_model_types(monkeypatch, {"sd3": TINY_MODEL_TYPE_SD3})
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", ckpt)
        s.option_set("image-dim", 64, 64)
        s.option_set("steps", 2)
        s.option_set("seed", 42)
        s.option_set("prompt", "a styled scene")
        return s

    base = make().generate()
    s2 = make()
    s2.option_set("lora", str(lora_path), 0.7)
    out = s2.generate()
    assert not np.allclose(base, out)


def test_sd3_peft_lora(ckpt, monkeypatch, tmp_path):
    """diffusers-peft SD3 LoRA (transformer.* names, shared with flux —
    the model's mmdit.joint_blocks params select the mmdit mapping)."""
    from safetensors.numpy import save_file

    P = TINY_MMDIT
    rng = np.random.default_rng(11)
    rank, d = 2, P.d_model
    arrays = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight":
            (rng.standard_normal((rank, d)) * 0.3).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight":
            (rng.standard_normal((d, rank)) * 0.3).astype(np.float32),
        "transformer.transformer_blocks.1.ff.net.2.lora_A.weight":
            (rng.standard_normal((rank, 4 * d)) * 0.3).astype(np.float32),
        "transformer.transformer_blocks.1.ff.net.2.lora_B.weight":
            (rng.standard_normal((d, rank)) * 0.3).astype(np.float32),
    }
    lora_path = tmp_path / "sd3-peft.safetensors"
    save_file(arrays, str(lora_path))

    def make():
        patch_tiny_model_types(monkeypatch, {"sd3": TINY_MODEL_TYPE_SD3})
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", ckpt)
        s.option_set("image-dim", 64, 64)
        s.option_set("steps", 2)
        s.option_set("seed", 42)
        s.option_set("prompt", "a peft-styled scene")
        return s

    base = make().generate()
    s2 = make()
    s2.option_set("lora", str(lora_path), 1.0)
    assert not np.allclose(base, s2.generate())


def test_sd3_dpmpp2m(session):
    """dpmpp2m's x0-prediction update is exact for rectified flow; the
    solver must run unchanged on the flow sigma table."""
    session.option_set("prompt", "q")
    session.option_set("method", "dpmpp2m")
    out = session.generate()
    assert np.isfinite(out).all()


def test_sd3_with_t5(ckpt, monkeypatch, tmp_path):
    """Loading tiny T5 weights + tokenizer changes the conditioning (real
    T5 rows instead of zeros) and the pipeline stays finite; without a
    tokenizer the session falls back to zero rows with a warning."""
    patch_tiny_model_types(monkeypatch, {"sd3": TINY_MODEL_TYPE_SD3})
    from mlimgsynth_tpu.testing import write_tiny_t5, write_tiny_t5_tokenizer
    t5_path = tmp_path / "tiny-t5.safetensors"
    tok_path = tmp_path / "t5-tok.json"
    write_tiny_t5(t5_path)
    write_tiny_t5_tokenizer(tok_path)

    def gen(**opts):
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", ckpt)
        s.option_set("image-dim", 64, 64)
        s.option_set("steps", 2)
        s.option_set("seed", 11)
        s.option_set("cfg-scale", 1.0)
        for k, v in opts.items():
            s.option_set(k, v)
        s.option_set("prompt", "a photo of a cat")
        img = s.generate()
        return s, img

    s0, img0 = gen()
    s1, img1 = gen(t5=str(t5_path), t5_tokenizer=str(tok_path))
    assert np.isfinite(img1).all()
    # T5 rows are live context: the generations must differ
    assert np.abs(img1 - img0).max() > 1e-6
    # weights without tokenizer -> zero rows, same output as no T5
    s2, img2 = gen(t5=str(t5_path))
    np.testing.assert_array_equal(img2, img0)
    # the cond tensor carries 77 clip + 77 t5 rows
    cond = np.asarray(s1.tensors["cond"])
    assert cond.shape[1] == 2 * 77
    assert np.abs(cond[:, 77:]).max() > 0
    cond2 = np.asarray(s2.tensors["cond"])
    assert np.abs(cond2[:, 77:]).max() == 0


def test_sd3_fused_encode_matches_host_path(session):
    """The fused-encode single-dispatch path (towers + pooled heads inside
    the loop program) matches the host-side encode path (forced via a step
    observer) bit-for-bit up to fusion reassociation."""
    session.option_set("prompt", "a (weighted:1.3) cat")
    session.option_set("nprompt", "ugly")
    session.option_set("cfg-scale", 4.0)
    fused = session.generate()
    cond_fused = np.asarray(session.tensors["cond"], np.float32)
    lab_fused = np.asarray(session.tensors["label"], np.float32)

    session.step_observer = lambda i, lat: None   # forces host-side encode
    session.option_set("seed", 42)
    session.option_set("prompt", "a (weighted:1.3) cat")
    session.option_set("nprompt", "ugly")
    session.option_set("cfg-scale", 4.0)
    host = session.generate()
    session.step_observer = None
    cond_host = np.asarray(session.tensors["cond"], np.float32)
    lab_host = np.asarray(session.tensors["label"], np.float32)

    np.testing.assert_allclose(cond_fused, cond_host, atol=2e-5)
    np.testing.assert_allclose(lab_fused, lab_host, atol=2e-5)
    np.testing.assert_allclose(fused, host, atol=2e-4)


def test_sd3_generate_batch_matches_singles(session):
    """The merged serving batch (fused dual-tower encode, per-request
    seeds/prompts) reproduces individual generates row by row."""
    reqs = [{"prompt": "a cat", "seed": 5},
            {"prompt": "a dog", "seed": 9}]
    session.option_set("cfg-scale", 4.0)
    batch, infos = session.generate_batch(reqs)
    assert batch.shape[0] == 2 and len(infos) == 2

    singles = []
    for r in reqs:
        session.option_set("seed", r["seed"])
        session.option_set("cfg-scale", 4.0)
        session.option_set("prompt", r["prompt"])
        singles.append(session.generate()[0])
    np.testing.assert_allclose(batch[0], singles[0], atol=2e-4)
    np.testing.assert_allclose(batch[1], singles[1], atol=2e-4)


def test_sd35_medium_identify_and_generate(monkeypatch, tmp_path):
    """An MMDiT-X checkpoint (attn2 tensors present) identifies as
    sd35_medium and generates through the session API."""
    from mlimgsynth_tpu.testing import TINY_MMDIT_X, TINY_VAE_SD3
    from mlimgsynth_tpu.testing import TINY_CLIP, TINY_CLIP2
    from mlimgsynth_tpu.api import ModelTypeDef
    from mlimgsynth_tpu.testing import write_checkpoint_sd3 as w
    mt = ModelTypeDef("sd35_medium", TINY_CLIP, TINY_CLIP2, TINY_MMDIT_X,
                      TINY_VAE_SD3, 64, 2)
    patch_tiny_model_types(monkeypatch, {"sd35_medium": mt})
    path = tmp_path / "tiny-sd35m.safetensors"
    w(path, P=TINY_MMDIT_X)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(path))
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 2)
    s.option_set("seed", 4)
    s.option_set("prompt", "dual attention")
    img = s.generate()
    assert s.c["model_type"] == "sd35_medium"
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()


def test_sd3_slg_matches_manual(session):
    """Skip-layer guidance == a hand-rolled loop: one EXTRA conditional
    eval with the named joint blocks elided, out += scale*(cond - skip),
    applied only on steps inside the [slg_start, slg_end) window."""
    session.setup()
    params = session._get_params("unet")
    P = TINY_MMDIT
    rng = np.random.default_rng(7)
    cond = rng.standard_normal((1, 10, P.d_ctx_in)).astype(np.float32) * 0.2
    ncond = rng.standard_normal((1, 10, P.d_ctx_in)).astype(np.float32) * 0.2
    pooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.2
    npooled = rng.standard_normal((1, P.d_pooled)).astype(np.float32) * 0.2
    x0 = rng.standard_normal((1, P.n_ch_in, 8, 8)).astype(np.float32)

    cfg = SamplerConfig(method="euler", n_step=4, cfg_scale=4.0,
                        flow_shift=3.0, slg_scale=2.5, slg_layers=(1,),
                        slg_start=0.0, slg_end=0.5)
    plan = make_plan(cfg, x0.shape, RngPhilox(42))
    got = run_sampler(params, x0, plan, cond, ncond, pooled, npooled,
                      None, cfg, P, dtype=jnp.float32)

    ctx = B.Ctx(params, dtype=jnp.float32)
    i0 = int(round(cfg.slg_start * plan.n_step))
    i1 = max(int(round(cfg.slg_end * plan.n_step)), i0 + 1)

    def vel(x_nchw, sigma, slg_on):
        t = jnp.full((1,), sigma * P.n_step_train, jnp.float32)
        xh = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        vc = np.asarray(mmdit_mod.mmdit_apply(
            ctx, xh, t, jnp.asarray(cond), jnp.asarray(pooled), P),
            np.float32)
        vu = np.asarray(mmdit_mod.mmdit_apply(
            ctx, xh, t, jnp.asarray(ncond), jnp.asarray(npooled), P),
            np.float32)
        v = cfg.cfg_scale * vc + (1.0 - cfg.cfg_scale) * vu
        if slg_on:
            vs = np.asarray(mmdit_mod.mmdit_apply(
                ctx, xh, t, jnp.asarray(cond), jnp.asarray(pooled), P,
                skip_layers=(1,)), np.float32)
            v = v + cfg.slg_scale * (vc - vs)
        return v.transpose(0, 3, 1, 2)

    sig = plan.sigmas
    x = x0 * (1.0 - sig[0]) + plan.noise0 * sig[0]
    for i in range(plan.n_step):
        x = x + vel(x, float(sig[i]), i0 <= i < i1) \
            * (float(sig[i + 1]) - float(sig[i]))
    np.testing.assert_allclose(got, x, atol=2e-4,
                               err_msg="slg trajectory mismatch")
    # the window gating is real: slg over the whole run differs
    cfg_all = SamplerConfig(method="euler", n_step=4, cfg_scale=4.0,
                            flow_shift=3.0, slg_scale=2.5, slg_layers=(1,),
                            slg_start=0.0, slg_end=1.0)
    plan2 = make_plan(cfg_all, x0.shape, RngPhilox(42))
    got_all = run_sampler(params, x0, plan2, cond, ncond, pooled, npooled,
                          None, cfg_all, P, dtype=jnp.float32)
    assert np.abs(got_all - got).max() > 1e-5


def test_sd3_slg_session_and_infotext(session):
    """--slg-scale through the session API: runs, infotext records it, and
    the layer range is validated against the model depth."""
    session.option_set("prompt", "a guided cat")
    session.option_set("cfg-scale", 4.0)
    session.option_set("slg-scale", 2.5)
    session.option_set("slg-layers", "1")
    session.option_set("slg-end", 1.0)
    img = session.generate()
    assert np.isfinite(img).all()
    assert "SLG scale: 2.5" in session.infotext
    # layer index beyond the tiny model's depth=2 -> clean error
    session.option_set("prompt", "a guided cat")
    session.option_set("slg-layers", "9")
    # option-error convention since round 4 (ADVICE r3): MlisError
    with pytest.raises(MlisError):
        session.generate()
