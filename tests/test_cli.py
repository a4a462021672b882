"""CLI surface tests (reference: src/main_mlimgsynth.c, main_tstore_util.c)."""
import sys

import numpy as np
import pytest

from mlimgsynth_tpu import cli, tstore_util
from mlimgsynth_tpu.utils import image as image_mod
from helpers import patch_tiny_model_types, write_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.safetensors"
    write_tiny_checkpoint(path)
    return str(path)


def run_cli(args):
    return cli.main(args)


def test_help(capsys):
    assert run_cli(["-h"]) == 0
    out = capsys.readouterr().out
    for cmd in ("generate", "list-backends", "vae-encode", "tokenize",
                "check"):
        assert cmd in out


def test_version(capsys):
    assert run_cli(["-V"]) == 0
    assert "mlimgsynth" in capsys.readouterr().out


def test_tokenize(capsys, monkeypatch):
    patch_tiny_model_types(monkeypatch)
    assert run_cli(["tokenize", "-p", "a dog jumping",
                    "--model-type", "sd1"]) == 0
    assert capsys.readouterr().out.strip() == "320 1929 11476"


def test_list_backends(capsys):
    assert run_cli(["list-backends"]) == 0
    out = capsys.readouterr().out
    assert "cpu" in out


def test_check(capsys):
    assert run_cli(["check"]) == 0
    assert "CHECK OK" in capsys.readouterr().out


def test_unknown_command():
    assert run_cli(["frobnicate"]) == 1


def test_unknown_option():
    assert run_cli(["generate", "--definitely-not-an-option", "1"]) == 1


def test_generate_png(tmp_path, monkeypatch, ckpt):
    patch_tiny_model_types(monkeypatch)
    out = tmp_path / "out.png"
    lat = tmp_path / "out.tensor"
    r = run_cli(["generate", "-m", ckpt, "--model-type", "sd1",
                 "-p", "a (cat:1.2) photo", "-o", str(out),
                 "--olatent", str(lat),
                 "-d", "64", "-s", "2", "-S", "1234",
                 "--cfg-scale", "3", "--method", "euler",
                 "--weight-type", "f32", "-q"])
    assert r == 0
    assert out.exists()
    img = image_mod.image_load(str(out))
    assert img.shape == (64, 64, 3)
    info = image_mod.png_read_parameters(str(out))
    assert "Seed: 1234" in info
    assert "a (cat:1.2) photo" in info
    # latent saved in TENSOR format
    t = image_mod.tensor_load(str(lat))
    assert t.shape == (1, 4, 8, 8)


def test_generate_from_latent(tmp_path, monkeypatch, ckpt):
    patch_tiny_model_types(monkeypatch)
    lat = tmp_path / "in.tensor"
    rng = np.random.default_rng(0)
    image_mod.tensor_save(str(lat),
                          rng.standard_normal((1, 4, 8, 8)).astype(np.float32))
    out = tmp_path / "out.png"
    r = run_cli(["generate", "-m", ckpt, "--model-type", "sd1",
                 "-p", "x", "--ilatent", str(lat), "-o", str(out),
                 "--f-t-ini", "0.5", "-s", "4", "--weight-type", "f32", "-q"])
    assert r == 0
    assert out.exists()


def test_vae_test_roundtrip(tmp_path, monkeypatch, ckpt, capsys):
    patch_tiny_model_types(monkeypatch)
    src = tmp_path / "in.png"
    rng = np.random.default_rng(1)
    image_mod.image_save(str(src),
                         (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    out = tmp_path / "rt.png"
    r = run_cli(["vae-test", "-m", ckpt, "--model-type", "sd1",
                 "-i", str(src), "-o", str(out), "--weight-type", "f32",
                 "-q"])
    assert r == 0
    assert out.exists()


def test_tstore_util_info_checksum_convert(tmp_path, ckpt, capsys):
    assert tstore_util.main(["info", "-i", ckpt]) == 0
    out = capsys.readouterr().out
    assert "model.diffusion_model" in out
    assert "Total data" in out

    assert tstore_util.main(["checksum", "-i", ckpt]) == 0
    out = capsys.readouterr().out
    assert "TOTAL: 0x" in out

    conv = tmp_path / "conv.safetensors"
    assert tstore_util.main(["convert", "-i", ckpt, "-o", str(conv),
                             "-T", "f16"]) == 0
    from mlimgsynth_tpu.io.tensorstore import TensorStore
    st = TensorStore.open(str(conv))
    name = st.names()[0]
    assert st.tensors[name].dtype == "f16"

    # quantized roundtrip
    q = tmp_path / "q8.safetensors"
    assert tstore_util.main(["convert", "-i", ckpt, "-o", str(q),
                             "-T", "q8_0"]) == 0


def test_tstore_util_extract(tmp_path, ckpt, capsys):
    out = tmp_path / "t.tensor"
    r = tstore_util.main(["extract", "-i", ckpt,
                          "-t", "model.diffusion_model.time_embed.0.weight",
                          "-o", str(out)])
    assert r == 0
    data = out.read_bytes()
    assert data.startswith(b"TENSOR F32 ")


def test_generate_from_gguf(tmp_path, monkeypatch, ckpt):
    """CLI generate from a GGUF checkpoint converted by tstore-util."""
    patch_tiny_model_types(monkeypatch)
    gguf = tmp_path / "tiny.gguf"
    assert tstore_util.main(["convert", "-i", ckpt, "-o", str(gguf),
                             "-T", "f32"]) == 0
    out = tmp_path / "g.png"
    r = run_cli(["generate", "-m", str(gguf), "--model-type", "sd1",
                 "-p", "gguf", "-o", str(out), "-d", "64", "-s", "2",
                 "--weight-type", "f32", "-q"])
    assert r == 0 and out.exists()


def test_vae_encode_decode_files(tmp_path, monkeypatch, ckpt):
    """vae-encode writes a latent; vae-decode reads it back to an image."""
    patch_tiny_model_types(monkeypatch)
    rng = np.random.default_rng(5)
    src = tmp_path / "src.png"
    image_mod.image_save(str(src),
                         (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    lat = tmp_path / "lat.tensor"
    r = run_cli(["vae-encode", "-m", ckpt, "--model-type", "sd1",
                 "-i", str(src), "--olatent", str(lat),
                 "--weight-type", "f32", "-q"])
    assert r == 0 and lat.exists()
    t = image_mod.tensor_load(str(lat))
    assert t.shape == (1, 4, 8, 8)
    out = tmp_path / "dec.png"
    r = run_cli(["vae-decode", "-m", ckpt, "--model-type", "sd1",
                 "--ilatent", str(lat), "-o", str(out),
                 "--weight-type", "f32", "-q"])
    assert r == 0 and out.exists()
    assert image_mod.image_load(str(out)).shape == (64, 64, 3)


def test_quiet_skips_progress(tmp_path, monkeypatch, ckpt, capsys):
    patch_tiny_model_types(monkeypatch)
    out = tmp_path / "q.png"
    r = run_cli(["generate", "-m", ckpt, "--model-type", "sd1", "-p", "x",
                 "-o", str(out), "-d", "64", "-s", "1",
                 "--weight-type", "f32", "-q"])
    assert r == 0
    captured = capsys.readouterr()
    assert "denoise" not in captured.err  # no per-step progress in quiet mode
