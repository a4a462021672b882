"""Weight-only int4 matmul: packing, kernel vs dequant reference, and
quantized end-to-end generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlimgsynth_tpu.ops import q4_matmul as q4


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def test_pack_unpack_exact():
    """Packing two nibbles per byte and unpacking is lossless for the
    quantized values (sign extension included)."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 320)).astype(np.float32) * 0.05
    packed, s = q4.quantize_weight_q4(w)
    assert packed.dtype == np.int8 and packed.shape == (128, 320)
    assert s.shape == (2, 320)
    qv = np.asarray(q4.unpack_q4(packed, 256))
    assert qv.min() >= -7 and qv.max() <= 7
    # re-derive the expected quantized values
    wb = w.reshape(2, 128, 320)
    expect = np.clip(np.round(wb / np.maximum(s[:, None, :], 1e-30)),
                     -7, 7).astype(np.int8).reshape(256, 320)
    np.testing.assert_array_equal(qv, expect)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 320)).astype(np.float32) * 0.05
    packed, s = q4.quantize_weight_q4(w)
    qv = np.asarray(q4.unpack_q4(packed, 256), np.float32)
    wd = (qv.reshape(2, 128, 320) * s[:, None, :]).reshape(256, 320)
    rel = np.abs(wd - w).max() / np.abs(w).max()
    assert rel < 0.15  # int4 per-block quantization error


@pytest.mark.parametrize("m,k,n", [(64, 256, 512), (77, 128, 512),
                                   (130, 384, 1024),
                                   (64, 2432, 128)])
def test_kernel_matches_dequant(m, k, n):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.3)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    packed, s = q4.quantize_weight_q4(w)
    qd, sd = jnp.asarray(packed), jnp.asarray(s)
    ref = np.asarray(q4.q4_matmul_xla(x, qd, sd))
    out = np.asarray(q4.q4_matmul(x, qd, sd, block_m=64, block_n=256))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_batched_input_shape():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 256)).astype(np.float32))
    w = rng.standard_normal((256, 512)).astype(np.float32)
    packed, s = q4.quantize_weight_q4(w)
    out = q4.q4_matmul(x, jnp.asarray(packed), jnp.asarray(s),
                       block_m=32, block_n=256)
    assert out.shape == (2, 16, 512)


def test_q4_generation_close_to_fp(tmp_path, monkeypatch):
    """End-to-end: weight-type q4_0 runs the packed-int4 linears and
    generates an image close to the fp one (int4 noise is visible but
    bounded on the tiny model)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from helpers import patch_tiny_model_types, write_tiny_checkpoint
    from mlimgsynth_tpu.api import MLImgSynth

    ckpt = tmp_path / "tiny.safetensors"
    write_tiny_checkpoint(ckpt)

    def gen(wt):
        patch_tiny_model_types(monkeypatch)
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("model-type", "sd1")
        if wt:
            s.option_set("weight-type", wt)
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        s.option_set("seed", 3)
        s.option_set("prompt", "an int4 test")
        img = s.generate()
        return img, s

    base, _ = gen("")
    img, s = gen("q4_0")
    assert s._weights_qbits == 4
    # the packed pairs actually exist in the loaded unet params
    dev = s._get_params("unet")
    assert any(k.endswith(".weight_q4") for k in dev)
    assert not any(k.endswith(".weight_q8") for k in dev)
    assert np.isfinite(img).all()
    assert np.abs(img - base).mean() < 0.15


@pytest.mark.parametrize("m,k,n", [(64, 256, 512), (130, 2432, 512),
                                   (77, 1024, 128)])
def test_ws_kernel_matches_xla(m, k, n):
    """Weight-stationary packed-int4 grid vs the unpack+dequant XLA
    reference."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.3)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    p, s = q4.quantize_weight_q4(w)
    pd, sd = jnp.asarray(p), jnp.asarray(s)
    ref = np.asarray(q4.q4_matmul_xla(x, pd, sd))
    out = np.asarray(q4.q4_matmul_ws(x, pd, sd))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_ws_nondividing_bn_matches_xla(monkeypatch):
    """bn need not divide N (cdiv stripes, overhang clipped on write)."""
    from mlimgsynth_tpu.ops import q8_matmul as q8
    monkeypatch.setattr(q8, "_plan_ws", lambda *a, **kw: (64, 256, 128))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((100, 256)).astype(np.float32) * .3)
    w = rng.standard_normal((256, 384)).astype(np.float32) * 0.05
    p, s = q4.quantize_weight_q4(w)
    pd, sd = jnp.asarray(p), jnp.asarray(s)
    ref = np.asarray(q4.q4_matmul_xla(x, pd, sd))
    out = np.asarray(q4.q4_matmul_ws(x, pd, sd))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_rs_row_sweep_matches_xla():
    """Row-sweep geometry (block_n = N, block_k override) vs the
    unpack+dequant XLA reference."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((200, 1024)).astype(np.float32) * .3)
    w = rng.standard_normal((1024, 384)).astype(np.float32) * 0.05
    p, s = q4.quantize_weight_q4(w)
    pd, sd = jnp.asarray(p), jnp.asarray(s)
    ref = np.asarray(q4.q4_matmul_xla(x, pd, sd))
    out = np.asarray(q4.q4_matmul(x, pd, sd, block_m=128, block_n=384,
                                  block_k=256))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)
