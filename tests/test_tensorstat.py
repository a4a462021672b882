import numpy as np

from mlimgsynth_tpu.utils.tensorstat import stat_line, tensor_stat


def test_stat_basic():
    x = np.arange(16, dtype=np.float32)
    st = tensor_stat(x)
    assert st.n == 16
    assert st.first == 0.0
    assert st.min == 0.0 and st.max == 15.0
    assert st.asum == 120.0
    assert len(st.hash) == 8
    # segment sums 1,5,...,29 -> scaled base64 indices 0,9,18,...,63
    assert st.hash == "AJSbkt2/"


def test_stat_line_format():
    x = np.zeros((1, 4, 8, 8), np.float32)
    line = stat_line(x, "latent")
    assert line.startswith("latent  : 8,8,4,1")
    assert stat_line(None, "x") == "x       : empty"


def test_hash_detects_changes():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1024).astype(np.float32)
    b = a.copy()
    b[512:] += 0.5
    assert tensor_stat(a).hash != tensor_stat(b).hash
    assert tensor_stat(a).hash == tensor_stat(a.copy()).hash
