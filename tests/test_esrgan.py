"""ESRGAN/RRDBNet upscaler: torch-kernel parity, checkpoint naming
variants, geometry inference, api/serving integration."""
import numpy as np
import pytest
import jax.numpy as jnp
from safetensors.numpy import save_file

from mlimgsynth_tpu.models import blocks as B
from mlimgsynth_tpu.models import esrgan as E
from torch_ref import torch_esrgan


def tiny_state(n_feat=8, n_block=2, growth=4, unshuffle=1, seed=0):
    """Random torch-layout (OIHW) RRDBNet state dict at tiny geometry."""
    r = np.random.RandomState(seed)

    def conv(ci, co):
        return (r.randn(co, ci, 3, 3).astype(np.float32) * 0.1,
                r.randn(co).astype(np.float32) * 0.01)

    st = {}

    def put(name, ci, co):
        w, b = conv(ci, co)
        st[name + ".weight"], st[name + ".bias"] = w, b

    ch_in = 3 * unshuffle * unshuffle
    put("conv_first", ch_in, n_feat)
    for i in range(n_block):
        for j in (1, 2, 3):
            for k in range(1, 6):
                ci = n_feat + (k - 1) * growth
                co = growth if k < 5 else n_feat
                put(f"body.{i}.rdb{j}.conv{k}", ci, co)
    put("conv_body", n_feat, n_feat)
    put("conv_up1", n_feat, n_feat)
    put("conv_up2", n_feat, n_feat)
    put("conv_hr", n_feat, n_feat)
    put("conv_last", n_feat, 3)
    return st


def run_jax(state, img_nchw, dtype=jnp.float32):
    P = (E.infer_params(state) if "conv_first.weight" in state
         else E._infer_srvgg(state))
    from mlimgsynth_tpu.weights import _to_layout
    ctx = B.Ctx(record=True, dtype=dtype)
    import jax
    jax.eval_shape(lambda x: E.upscaler_apply(ctx, x, P),
                   jnp.zeros((1, 8 * P.unshuffle, 8 * P.unshuffle, 3)))
    params = {n: _to_layout(state[n], ps, n).astype(np.dtype(ps.dtype))
              for n, ps in ctx.spec.items()}
    x = jnp.asarray(np.asarray(img_nchw, np.float32).transpose(0, 2, 3, 1))
    out = E.upscaler_apply(B.Ctx(params, dtype=dtype), x, P)
    return np.asarray(out, np.float32).transpose(0, 3, 1, 2), P


@pytest.mark.parametrize("unshuffle", [1, 2])
def test_esrgan_torch_parity(unshuffle):
    st = tiny_state(unshuffle=unshuffle, seed=3 + unshuffle)
    img = np.random.RandomState(7).rand(1, 3, 8, 8).astype(np.float32)
    ours, P = run_jax(st, img)
    assert P.unshuffle == unshuffle and P.scale == 4 // unshuffle
    ref = torch_esrgan(st, img, n_block=P.n_block, unshuffle=unshuffle)
    assert ours.shape == (1, 3, 8 * P.scale, 8 * P.scale)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_esrgan_load_safetensors(tmp_path):
    st = tiny_state()
    path = tmp_path / "up.safetensors"
    save_file(st, str(path))
    params, P = E.load_esrgan(str(path), dtype=jnp.float32)
    assert P.n_feat == 8 and P.n_block == 2 and P.growth == 4
    # conv weights arrive HWIO
    assert params["conv_first.weight"].shape == (3, 3, 3, 8)


def test_esrgan_load_pth_and_oldnames(tmp_path):
    import torch
    st = tiny_state(n_block=2)
    # old-arch sequential naming, wrapped in a params dict like
    # Real-ESRGAN releases
    old = {}
    for k, v in st.items():
        name, _, leaf = k.rpartition(".")
        if name == "conv_first":
            old[f"model.0.{leaf}"] = v
        elif name == "conv_body":
            old[f"model.1.sub.2.{leaf}"] = v
        elif name == "conv_up1":
            old[f"model.3.{leaf}"] = v
        elif name == "conv_up2":
            old[f"model.6.{leaf}"] = v
        elif name == "conv_hr":
            old[f"model.8.{leaf}"] = v
        elif name == "conv_last":
            old[f"model.10.{leaf}"] = v
        else:  # body.i.rdbJ.convK -> model.1.sub.i.RDBJ.convK.0
            _, i, rdb, convk = name.split(".")
            old[f"model.1.sub.{i}.{rdb.upper().replace('RDB', 'RDB')}"
                f".{convk}.0.{leaf}"] = v
    path = tmp_path / "old.pth"
    torch.save({"params_ema": {k: torch.from_numpy(v)
                               for k, v in old.items()}}, str(path))
    params, P = E.load_esrgan(str(path), dtype=jnp.float32)
    assert P.n_block == 2
    np.testing.assert_array_equal(
        params["conv_body.weight"],
        st["conv_body.weight"].transpose(2, 3, 1, 0))


def test_esrgan_infer_rejects_non_esrgan():
    with pytest.raises(ValueError):
        E.infer_params({"foo.weight": np.zeros((4, 4))})


def _tiny_up_file(tmp_path, name="up4.safetensors", **kw):
    path = tmp_path / name
    save_file(tiny_state(**kw), str(path))
    return str(path)


def test_session_upscale(tmp_path):
    from mlimgsynth_tpu.api import MLImgSynth
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set_str("upscaler", _tiny_up_file(tmp_path))
    img = np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32)
    out = s.upscale(img)
    assert out.shape == (2, 3, 32, 32)
    assert np.isfinite(out).all()
    # resize overrides the native factor (Lanczos post-resize)
    out2 = s.upscale(img, resize=2)
    assert out2.shape == (2, 3, 16, 16)


def test_session_upscale_unconfigured():
    from mlimgsynth_tpu.api import MLImgSynth, MlisError
    s = MLImgSynth()
    with pytest.raises(MlisError):
        s.upscale(np.zeros((1, 3, 8, 8), np.float32))


def test_hires_image_space(tmp_path, monkeypatch):
    import sys
    sys.path.insert(0, "tests")
    from helpers import patch_tiny_model_types, write_tiny_checkpoint
    from mlimgsynth_tpu.api import MLImgSynth
    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "sd1.safetensors"
    write_tiny_checkpoint(ckpt)
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    s.option_set("seed", 11)
    s.option_set_str("upscaler", _tiny_up_file(tmp_path))
    s.option_set_str("hires-fix", "2")
    s.option_set_str("hires-upscaler", "up4")
    s.option_set("prompt", "an image-space hires test")
    img = s.generate()
    assert img.shape == (1, 3, 128, 128)
    assert np.isfinite(img).all()
    assert "Hires upscaler: up4" in s.infotext

    # batched path
    imgs, infos = s.generate_batch([{"prompt": "hr batch", "seed": 9}])
    assert imgs.shape == (1, 3, 128, 128)
    assert "Hires upscaler: up4" in infos[0]


def test_a1111_hr_upscaler_translation():
    from mlimgsynth_tpu.server import _a1111_to_req
    out = _a1111_to_req({"prompt": "p", "enable_hr": True,
                         "hr_upscaler": "R-ESRGAN 4x+",
                         "sampler_name": "Euler"})
    assert out["hires_upscaler"] == "R-ESRGAN 4x+"
    out2 = _a1111_to_req({"prompt": "p", "enable_hr": True,
                          "hr_upscaler": "Latent (nearest)",
                          "sampler_name": "Euler"})
    assert "hires_upscaler" not in out2


@pytest.mark.parametrize("unshuffle", [1, 2])
def test_session_upscale_tiled(tmp_path, unshuffle):
    """Tiled upscale: one-dispatch scan covers the image; interior far
    from seams matches the untiled pass; output stays in range."""
    from mlimgsynth_tpu.api import MLImgSynth
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set_str("upscaler", _tiny_up_file(
        tmp_path, name=f"u{unshuffle}.safetensors", n_block=1,
        unshuffle=unshuffle))
    img = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    full = s.upscale(img)
    tiled = s.upscale(img, tile=16)
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    sc = 4 // unshuffle
    # center of the first tile's inner region is bit-identical to a
    # whole-tile run of the same geometry; vs the full pass it differs
    # only by receptive-field truncation at the margins
    d = np.abs(tiled - full)
    assert float(d.mean()) < 0.05
    # tile >= image falls back to the untiled path exactly
    np.testing.assert_array_equal(s.upscale(img, tile=64), full)


def tiny_srvgg_state(n_feat=8, n_conv=3, scale=4, seed=0):
    r = np.random.RandomState(seed)
    st = {}

    def put_conv(i, ci, co):
        st[f"body.{i}.weight"] = r.randn(co, ci, 3, 3).astype(
            np.float32) * 0.1
        st[f"body.{i}.bias"] = r.randn(co).astype(np.float32) * 0.01

    def put_act(i, c):
        st[f"body.{i}.weight"] = (
            0.1 + 0.1 * r.rand(c).astype(np.float32))

    put_conv(0, 3, n_feat)
    put_act(1, n_feat)
    for i in range(n_conv):
        put_conv(2 * i + 2, n_feat, n_feat)
        put_act(2 * i + 3, n_feat)
    put_conv(2 * n_conv + 2, n_feat, 3 * scale * scale)
    return st


@pytest.mark.parametrize("scale", [2, 4])
def test_srvgg_torch_parity(scale):
    from torch_ref import torch_srvgg
    st = tiny_srvgg_state(scale=scale, seed=scale)
    img = np.random.RandomState(5).rand(1, 3, 8, 8).astype(np.float32)
    ours, P = run_jax(st, img)
    assert type(P).__name__ == "SrvggParams"
    assert P.scale == scale and P.n_conv == 3
    ref = torch_srvgg(st, img, n_conv=P.n_conv, scale=scale)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_srvgg_session(tmp_path):
    from mlimgsynth_tpu.api import MLImgSynth
    path = tmp_path / "srvgg.safetensors"
    save_file(tiny_srvgg_state(), str(path))
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set_str("upscaler", str(path))
    img = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32)
    out = s.upscale(img)
    assert out.shape == (1, 3, 32, 32)
    # tiled path dispatches the same arch
    big = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    t = s.upscale(big, tile=16)
    assert t.shape == (1, 3, 256, 256) and np.isfinite(t).all()


def test_unshuffle_odd_size(tmp_path):
    """x2 (unshuffle) models accept dims that aren't unshuffle multiples:
    the input pads edge-replicated, the output crops back."""
    from mlimgsynth_tpu.api import MLImgSynth
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set_str("upscaler", _tiny_up_file(
        tmp_path, name="odd2.safetensors", n_block=1, unshuffle=2))
    img = np.random.RandomState(2).rand(1, 3, 9, 11).astype(np.float32)
    out = s.upscale(img)
    assert out.shape == (1, 3, 18, 22)
    assert np.isfinite(out).all()

