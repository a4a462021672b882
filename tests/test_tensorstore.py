import json
import struct

import numpy as np
import pytest

from mlimgsynth_tpu.io import gquant
from mlimgsynth_tpu.io.tensorstore import (TensorStore, bf16_to_f32,
                                           f32_to_bf16)


@pytest.fixture
def st_file(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 8), dtype=np.float32),
        "b.bias": rng.standard_normal((16,), dtype=np.float32).astype(np.float16),
        "c": np.arange(24, dtype=np.int32).reshape(2, 3, 4),
    }
    path = tmp_path / "model.safetensors"
    save_file(tensors, str(path), metadata={"hello": "world"})
    return path, tensors


def test_safetensors_read(st_file):
    path, tensors = st_file
    st = TensorStore.open(str(path))
    assert st.format == "safetensors"
    assert st.meta.get("hello") == "world"
    assert set(st.names()) == set(tensors)
    for name, ref in tensors.items():
        got = st.read(name)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)
    # dtype conversion on read
    b32 = st.read("b.bias", "f32")
    assert b32.dtype == np.float32
    np.testing.assert_allclose(b32, tensors["b.bias"].astype(np.float32))


def test_cache_overrides(st_file):
    path, tensors = st_file
    st = TensorStore.open(str(path))
    patched = np.ones((4, 8), np.float32)
    st.cache_set("a.weight", patched)
    np.testing.assert_array_equal(st.read("a.weight"), patched)
    st.cache_clear()
    np.testing.assert_array_equal(st.read("a.weight"), tensors["a.weight"])


def test_write_roundtrip(st_file, tmp_path):
    from safetensors.numpy import load_file
    path, tensors = st_file
    st = TensorStore.open(str(path))
    out = tmp_path / "out.safetensors"
    st.write_safetensors(str(out))
    back = load_file(str(out))
    for name, ref in tensors.items():
        np.testing.assert_array_equal(back[name], ref)


def test_write_convert_f16(st_file, tmp_path):
    from safetensors.numpy import load_file
    path, tensors = st_file
    st = TensorStore.open(str(path))
    out = tmp_path / "out16.safetensors"
    st.write_safetensors(str(out), dtype="f16")
    back = load_file(str(out))
    assert back["a.weight"].dtype == np.float16
    assert back["c"].dtype == np.int32  # ints not converted
    np.testing.assert_allclose(back["a.weight"],
                               tensors["a.weight"].astype(np.float16))


def test_bf16_roundtrip():
    x = np.array([1.0, -2.5, 3.14159, 1e-20, 65504.0], np.float32)
    enc = f32_to_bf16(x)
    dec = bf16_to_f32(enc.view(np.uint8))
    np.testing.assert_allclose(dec, x, rtol=1e-2)


@pytest.mark.parametrize("dt", ["q8_0", "q4_1", "q4_k", "q5_k", "q6_k"])
def test_quant_roundtrip(dt):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1024).astype(np.float32)
    raw = gquant.QUANT[dt](x)
    assert raw.nbytes == gquant.nbytes(dt, 1024)
    y = gquant.DEQUANT[dt](raw, 1024)
    tol = {"q8_0": 0.02, "q4_1": 0.2, "q4_k": 0.25, "q5_k": 0.12,
           "q6_k": 0.08}[dt]
    assert np.abs(y - x).max() < tol


@pytest.mark.parametrize("dt", ["q4_k", "q5_k", "q6_k"])
def test_kquant_edge_blocks(dt):
    # all-zero, constant-positive, constant-negative super-blocks
    for x in (np.zeros(256, np.float32),
              np.full(256, 0.7, np.float32),
              np.full(256, -0.7, np.float32),
              np.concatenate([np.zeros(128), np.ones(128)]).astype(
                  np.float32)):
        y = gquant.DEQUANT[dt](gquant.QUANT[dt](x), 256)
        assert np.abs(y - x).max() < 0.05, (dt, np.abs(y - x).max())


def test_dequant_q4k_handmade():
    # One q4_K super-block with known scales: d=1, dmin=0, all 6-bit scales=1
    block = np.zeros(144, np.uint8)
    block[0:2] = np.array([1.0], np.float16).view(np.uint8)  # d=1
    block[2:4] = np.array([0.0], np.float16).view(np.uint8)  # dmin=0
    block[4:8] = 1  # sc[0..3]=1
    block[8:12] = 0  # mn[0..3]=0
    block[12:16] = 0x11  # sc[4..7]=1, mn[4..7]=... (low nibbles)
    qs = np.arange(128, dtype=np.uint8) % 16
    block[16:] = qs | (qs << 4)
    y = gquant.dequant_q4_k(block, 256)
    # groups of 64: first 32 from low nibble, next 32 from high nibble
    np.testing.assert_array_equal(y[:32], (np.arange(32) % 16).astype(np.float32))


def test_gguf_read(tmp_path):
    # hand-built minimal GGUF v3 file: 1 kv + 2 tensors (f32, f16)
    rng = np.random.default_rng(2)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float16)

    def s(x):
        bs = x.encode()
        return struct.pack("<Q", len(bs)) + bs

    buf = b"GGUF" + struct.pack("<IQQ", 3, 2, 1)
    buf += s("general.name") + struct.pack("<I", 8) + s("test")
    # tensor infos: dims in ggml order (innermost first)
    buf += s("t.a") + struct.pack("<I", 2) + struct.pack("<QQ", 4, 3)
    buf += struct.pack("<IQ", 0, 0)  # f32, offset 0
    boff = (a.nbytes + 31) // 32 * 32
    buf += s("t.b") + struct.pack("<I", 1) + struct.pack("<Q", 8)
    buf += struct.pack("<IQ", 1, boff)  # f16
    pad = (-len(buf)) % 32
    buf += b"\0" * pad
    buf += a.tobytes() + b"\0" * (boff - a.nbytes) + b.tobytes()

    path = tmp_path / "m.gguf"
    path.write_bytes(buf)
    st = TensorStore.open(str(path))
    assert st.format == "gguf"
    assert json.loads(st.meta["general.name"]) if False else True
    assert st.meta["general.name"] == "test"
    got_a = st.read("t.a")
    assert got_a.shape == (3, 4)  # reversed to row-major
    np.testing.assert_array_equal(got_a, a)
    np.testing.assert_array_equal(st.read("t.b"), b)


def test_multi_file_store(st_file, tmp_path):
    from safetensors.numpy import save_file
    path, tensors = st_file
    extra = {"tae.x": np.ones((2, 2), np.float32)}
    p2 = tmp_path / "tae.safetensors"
    save_file({"x": extra["tae.x"]}, str(p2))
    st = TensorStore.open(str(path))
    st.read_file(str(p2), prefix="tae.")
    np.testing.assert_array_equal(st.read("tae.x"), extra["tae.x"])
    np.testing.assert_array_equal(st.read("a.weight"), tensors["a.weight"])


def test_gguf_write_roundtrip(st_file, tmp_path):
    path, tensors = st_file
    st = TensorStore.open(str(path))
    out = tmp_path / "out.gguf"
    st.write_gguf(str(out))
    back = TensorStore.open(str(out))
    assert back.format == "gguf"
    for name, ref in tensors.items():
        np.testing.assert_array_equal(back.read(name), ref)
    # quantized gguf roundtrip
    outq = tmp_path / "out_q8.gguf"
    st.write_gguf(str(outq), dtype="q8_0")
    backq = TensorStore.open(str(outq))
    a = backq.read("a.weight")
    assert np.abs(a - tensors["a.weight"]).max() < 0.05
