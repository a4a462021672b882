"""HTTP serving mode test: real socket round-trip."""
import io
import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import patch_tiny_model_types, write_tiny_checkpoint


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    import socket
    from http.server import ThreadingHTTPServer
    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu import api as api_mod
    from mlimgsynth_tpu.server import Server, make_handler
    from mlimgsynth_tpu.testing import TINY_MODEL_TYPE

    ckpt = tmp_path_factory.mktemp("m") / "tiny.safetensors"
    write_tiny_checkpoint(ckpt)
    orig = api_mod._model_types
    api_mod._model_types = lambda: {"sd1": TINY_MODEL_TYPE}
    try:
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        srv = Server(s)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        httpd.shutdown()
    finally:
        api_mod._model_types = orig


def test_health(server_url):
    with urllib.request.urlopen(server_url + "/health") as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"


def test_generate_png(server_url):
    req = urllib.request.Request(
        server_url + "/generate",
        data=json.dumps({"prompt": "a cat", "seed": 5}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "image/png"
        body = r.read()
    from PIL import Image
    img = Image.open(io.BytesIO(body))
    assert img.size == (64, 64)
    assert "Seed: 5" in img.info.get("parameters", "")


def test_generate_missing_prompt(server_url):
    req = urllib.request.Request(server_url + "/generate", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_info(server_url):
    with urllib.request.urlopen(server_url + "/info") as r:
        data = json.loads(r.read())
    assert data["backend"]["name"] == "cpu"
    assert data["requests"] >= 1
