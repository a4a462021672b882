import numpy as np
import pytest

from mlimgsynth_tpu.utils import image as im


def test_tensor_image_roundtrip():
    rng = np.random.default_rng(0)
    u8 = (rng.random((16, 12, 3)) * 255).astype(np.uint8)
    t = im.tensor_from_image_arr(u8)
    assert t.shape == (1, 3, 16, 12)
    back = im.tensor_to_image_arr(t)
    np.testing.assert_array_equal(back, u8)


def test_tensor_file_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    t = rng.standard_normal((2, 4, 8, 6)).astype(np.float32)
    p = tmp_path / "t.tensor"
    im.tensor_save(str(p), t)
    # header is byte-compatible with the reference TENSOR format
    assert p.read_bytes().startswith(b"TENSOR F32 6 8 4 2\n")
    back = im.tensor_load(str(p))
    np.testing.assert_array_equal(back, t)


def test_tensor_load_rejects_garbage(tmp_path):
    p = tmp_path / "bad.tensor"
    p.write_bytes(b"NOTATENSOR 1 2 3 4\n" + b"\0" * 64)
    with pytest.raises(ValueError):
        im.tensor_load(str(p))


def test_mask_downsize_blockmean():
    m = np.zeros((1, 1, 16, 16), np.float32)
    m[0, 0, :8] = 1.0
    d = im.mask_downsize(m, 8)
    assert d.shape == (1, 1, 2, 2)
    np.testing.assert_allclose(d[0, 0], [[1.0, 1.0], [0.0, 0.0]])


def test_redblue_preview():
    t = np.array([[-2.0, 0.0], [0.0, 1.0]], np.float32)
    img = im.tensor_img_redblue(t)
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] == 255 and img[0, 0, 2] == 0   # negative -> red
    assert img[1, 1, 2] == 127 and img[1, 1, 0] == 0   # positive -> blue
    assert img[0, 1].tolist() == [0, 0, 0]


def test_png_infotext_roundtrip(tmp_path):
    u8 = np.zeros((8, 8, 3), np.uint8)
    p = tmp_path / "x.png"
    im.image_save(str(p), u8, infotext="hello\nSeed: 1")
    assert im.png_read_parameters(str(p)) == "hello\nSeed: 1"


def test_alpha_split():
    t = np.zeros((1, 4, 4, 4), np.float32)
    t[:, 3] = 0.5
    rgb, mask = im.image_alpha_split(t)
    assert rgb.shape == (1, 3, 4, 4)
    assert mask.shape == (1, 1, 4, 4)
    assert np.all(mask == 0.5)
