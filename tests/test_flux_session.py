"""Flux session e2e: aux-file loading (--clip/--vae), identification,
guidance-embedded generation, schedule shift.

The distribution shape under test is the real one: a transformer-only
model file (bare double_blocks.* names), a bare-HF CLIP file without
text_projection, and a bare VAE file — plus optional T5."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.api import MLImgSynth, ModelTypeDef
from mlimgsynth_tpu.testing import (TINY_CLIP, TINY_FLUX_DEV,
                                    TINY_FLUX_SCHNELL, TINY_VAE_FLUX,
                                    write_tiny_flux_files,
                                    write_tiny_t5, write_tiny_t5_tokenizer)
from helpers import patch_tiny_model_types


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("flux")
    return write_tiny_flux_files(d)


@pytest.fixture(scope="module")
def files_dev(tmp_path_factory):
    d = tmp_path_factory.mktemp("fluxdev")
    return write_tiny_flux_files(d, P=TINY_FLUX_DEV)


def _types():
    return {
        "flux_schnell": ModelTypeDef("flux_schnell", TINY_CLIP, None,
                                     TINY_FLUX_SCHNELL, TINY_VAE_FLUX,
                                     64, 1),
        "flux_dev": ModelTypeDef("flux_dev", TINY_CLIP, None,
                                 TINY_FLUX_DEV, TINY_VAE_FLUX, 64, 1),
    }


def _session(files, monkeypatch, **opts):
    patch_tiny_model_types(monkeypatch, _types())
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", files["model"])
    s.option_set("clip", files["clip"])
    s.option_set("vae", files["vae"])
    s.option_set("image-dim", 64, 64)
    s.option_set("steps", 2)
    s.option_set("seed", 21)
    for k, v in opts.items():
        s.option_set(k, v)
    return s


def test_flux_schnell_identify_and_generate(files, monkeypatch):
    s = _session(files, monkeypatch)
    s.option_set("prompt", "a rope-rotated cat")
    img = s.generate()
    assert s.c["model_type"] == "flux_schnell"
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(img).all()


def test_flux_dev_guidance(files_dev, monkeypatch):
    """dev identifies from guidance_in; cfg_scale feeds the embedded
    guidance (no uncond pass) and different guidance changes the image."""
    s = _session(files_dev, monkeypatch)
    s.option_set("prompt", "g")
    s.option_set("cfg-scale", 3.5)
    a = s.generate()
    assert s.c["model_type"] == "flux_dev"
    # NFE: guidance-embedded => 1 per step despite cfg > 1
    assert s.progress["nfe"] == 2
    s.option_set("seed", 21)
    s.option_set("prompt", "g")
    s.option_set("cfg-scale", 1.5)
    b = s.generate()
    assert np.abs(a - b).max() > 1e-6


def test_flux_reproducible_and_batch(files, monkeypatch):
    s = _session(files, monkeypatch)
    s.option_set("prompt", "a dog")
    a = s.generate()
    s.option_set("seed", 21)
    s.option_set("prompt", "a dog")
    b = s.generate()
    np.testing.assert_array_equal(a, b)
    imgs, infos = s.generate_batch([{"prompt": "a dog", "seed": 21}])
    np.testing.assert_allclose(imgs[0], a[0], atol=2e-4)


def test_flux_img2img_and_inpaint(files, monkeypatch):
    """Flow img2img at the sigma level (x interpolated toward noise at
    sigma(f_t_ini)) and alpha-mask inpainting both ride the shared sampler
    path for flux."""
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    s = _session(files, monkeypatch)
    s.option_set("image", img)
    s.option_set("f-t-ini", 0.6)
    s.option_set("prompt", "a repainted cat")
    out = s.generate()
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(out).all()
    assert "Mode: img2img" in s.infotext

    mask = np.zeros((1, 1, 64, 64), np.float32)
    mask[..., 16:48, 16:48] = 1.0
    s2 = _session(files, monkeypatch)
    s2.option_set("image", img)
    s2.option_set("image_mask", mask)
    s2.option_set("f-t-ini", 0.6)
    s2.option_set("prompt", "a repainted cat")
    out2 = s2.generate()
    assert np.isfinite(out2).all()
    assert "inpaint" in s2.infotext.lower()


def test_flux_kohya_lora(files, monkeypatch, tmp_path):
    """A kohya-format flux LoRA (flattened-underscore module names,
    lora_unet_ prefix) patches the fused double/single-stream linears."""
    from safetensors.numpy import save_file

    P = TINY_FLUX_SCHNELL
    rng = np.random.default_rng(3)
    rank, d = 2, P.d_model

    def pair(base, in_d, out_d, peft=False):
        dn, up = ("lora_A", "lora_B") if peft else ("lora_down", "lora_up")
        return {
            f"{base}.{dn}.weight":
                (rng.standard_normal((rank, in_d)) * 0.2).astype(np.float32),
            f"{base}.{up}.weight":
                (rng.standard_normal((out_d, rank)) * 0.2).astype(np.float32),
            f"{base}.alpha": np.array(4.0, np.float32),
        }

    arrays = {}
    arrays.update(pair("lora_unet_double_blocks_0_img_attn_qkv", d, 3 * d))
    arrays.update(pair("lora_unet_double_blocks_0_txt_mlp_0", d,
                       P.mlp_ratio * d, peft=True))
    arrays.update(pair("lora_unet_single_blocks_0_linear1", d,
                       3 * d + P.mlp_ratio * d))
    lora_path = tmp_path / "flux-style.safetensors"
    save_file(arrays, str(lora_path))

    s = _session(files, monkeypatch)
    s.option_set("prompt", "a stylized cat")
    base = s.generate()

    s2 = _session(files, monkeypatch)
    s2.option_set("lora", str(lora_path), 0.8)
    s2.option_set("prompt", "a stylized cat")
    out = s2.generate()
    assert not np.allclose(base, out)

    s3 = _session(files, monkeypatch)
    s3.option_set("lora", str(lora_path), 0.0)
    s3.option_set("prompt", "a stylized cat")
    np.testing.assert_allclose(s3.generate(), base, atol=1e-5)


def test_flux_peft_lora_slice_equivalence(files, monkeypatch, tmp_path):
    """A diffusers-peft flux LoRA on attn.to_q (a THIRD of the fused qkv)
    must produce the same image as a kohya full-qkv LoRA whose up matrix
    is the same rows zero-padded into the k/v thirds — the fused-slice
    delta math, checked end to end.  Also patches a single-block to_v and
    proj_mlp (sevenths of linear1)."""
    from safetensors.numpy import save_file

    P = TINY_FLUX_SCHNELL
    rng = np.random.default_rng(9)
    rank, d = 2, P.d_model
    down_q = (rng.standard_normal((rank, d)) * 0.3).astype(np.float32)
    up_q = (rng.standard_normal((d, rank)) * 0.3).astype(np.float32)
    down_v1 = (rng.standard_normal((rank, d)) * 0.3).astype(np.float32)
    up_v1 = (rng.standard_normal((d, rank)) * 0.3).astype(np.float32)
    down_m = (rng.standard_normal((rank, d)) * 0.3).astype(np.float32)
    up_m = (rng.standard_normal((P.mlp_ratio * d, rank)) * 0.3) \
        .astype(np.float32)

    peft = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": down_q,
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": up_q,
        "transformer.single_transformer_blocks.0.attn.to_v.lora_A.weight":
            down_v1,
        "transformer.single_transformer_blocks.0.attn.to_v.lora_B.weight":
            up_v1,
        "transformer.single_transformer_blocks.0.proj_mlp.lora_A.weight":
            down_m,
        "transformer.single_transformer_blocks.0.proj_mlp.lora_B.weight":
            up_m,
    }
    p_peft = tmp_path / "peft.safetensors"
    save_file(peft, str(p_peft))

    # equivalent kohya LoRAs against the FUSED weights: zero-pad the up
    # matrices into the untouched rows (scale: peft has no alpha => 1.0;
    # kohya alpha=rank gives alpha/rank = 1.0 too)
    z = np.zeros((d, rank), np.float32)
    up_qkv = np.concatenate([up_q, z, z], 0)
    up_l1 = np.concatenate([z, z, up_v1, np.zeros((P.mlp_ratio * d, rank),
                                                  np.float32)], 0)
    up_l1m = np.concatenate([z, z, z, up_m], 0)
    kohya = {
        "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight": down_q,
        "lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight": up_qkv,
        "lora_unet_double_blocks_0_img_attn_qkv.alpha":
            np.array(rank, np.float32),
        "lora_unet_single_blocks_0_linear1.lora_down.weight": down_v1,
        "lora_unet_single_blocks_0_linear1.lora_up.weight": up_l1,
        "lora_unet_single_blocks_0_linear1.alpha":
            np.array(rank, np.float32),
    }
    p_kohya = tmp_path / "kohya.safetensors"
    save_file(kohya, str(p_kohya))
    kohya2 = dict(kohya)
    kohya2["lora_unet_single_blocks_0_linear1.lora_down.weight"] = down_m
    kohya2["lora_unet_single_blocks_0_linear1.lora_up.weight"] = up_l1m
    # two patches on the same tensor accumulate -> ship as a second file
    del kohya2["lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight"]
    del kohya2["lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight"]
    del kohya2["lora_unet_double_blocks_0_img_attn_qkv.alpha"]
    p_kohya2 = tmp_path / "kohya2.safetensors"
    save_file(kohya2, str(p_kohya2))

    def gen(*loras):
        s = _session(files, monkeypatch)
        for p in loras:
            s.option_set("lora", str(p), 1.0)
        s.option_set("prompt", "slice equivalence")
        return s.generate()

    base = gen()
    img_peft = gen(p_peft)
    img_kohya = gen(p_kohya, p_kohya2)
    assert not np.allclose(base, img_peft)
    np.testing.assert_allclose(img_peft, img_kohya, atol=2e-5)


def test_flux_gguf_quantized(files, monkeypatch, tmp_path):
    """A q8_0 GGUF flux transformer (the city96-style distribution format:
    bare double_blocks.* names in a GGUF container) loads through the
    session with safetensors aux clip/vae and generates."""
    from mlimgsynth_tpu.io.tensorstore import TensorStore, write_gguf

    st = TensorStore.open(files["model"])
    gg = tmp_path / "flux-q8_0.gguf"
    write_gguf(st, str(gg), dtype="q8_0")
    st.close()

    s = _session(dict(files, model=str(gg)), monkeypatch)
    s.option_set("prompt", "a quantized rope cat")
    img = s.generate()
    assert s.c["model_type"] == "flux_schnell"
    assert np.isfinite(img).all()


def test_flux_tae_fast_decode_and_mismatch(files, monkeypatch, tmp_path):
    """TAE fast decode for the flow families: the session infers the TAE's
    latent channel count from the checkpoint (taef1/taesd3 are 16-ch) and
    rides the same fused decode path; a channel mismatch with the model
    family is a clear error instead of a shape explosion."""
    from mlimgsynth_tpu.api import MlisError
    from mlimgsynth_tpu.models import tae as tae_mod
    from mlimgsynth_tpu.testing import write_tiny_tae

    # matching TAE (tiny flux family is 4-ch latents: n_ch_in 16 = 4 x 2x2)
    tae_path = tmp_path / "taef-tiny.safetensors"
    tae_p = write_tiny_tae(tae_path, ch_z=4)
    monkeypatch.setattr(tae_mod, "TAE_SD1", tae_p)
    s = _session(files, monkeypatch)
    s.option_set("tae", str(tae_path))
    s.option_set("prompt", "a fast-decoded cat")
    img = s.generate()
    assert np.isfinite(img).all()
    assert "VAE: tae" in s.infotext

    # a 16-ch TAE (the real taef1 shape) against this 4-ch tiny family
    # must raise the channel-mismatch error from the inferred geometry
    tae16 = tmp_path / "taef1-16.safetensors"
    write_tiny_tae(tae16, ch_z=16)
    s2 = _session(files, monkeypatch)
    s2.option_set("tae", str(tae16))
    s2.option_set("prompt", "mismatch")
    with pytest.raises(MlisError, match="latent channels"):
        s2.generate()


def test_flux_with_t5_context(files, monkeypatch, tmp_path):
    t5p = tmp_path / "t5.safetensors"
    tok = tmp_path / "tok.json"
    write_tiny_t5(t5p)
    write_tiny_t5_tokenizer(tok)
    s = _session(files, monkeypatch)
    s.option_set("prompt", "a photo of a cat")
    base = s.generate()
    s2 = _session(files, monkeypatch, t5=str(t5p), t5_tokenizer=str(tok))
    s2.option_set("prompt", "a photo of a cat")
    out = s2.generate()
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6  # T5 context is live
    cond = np.asarray(s2.tensors["cond"])
    assert cond.shape[-1] == TINY_FLUX_SCHNELL.d_ctx_in
    assert np.abs(cond).max() > 0
