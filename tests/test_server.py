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
        srv = Server(s, merge_window_s=0.3)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}", srv
        httpd.shutdown()
    finally:
        api_mod._model_types = orig


def test_health(server_url):
    server_url, _ = server_url
    with urllib.request.urlopen(server_url + "/health") as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"


def test_generate_png(server_url):
    server_url, _ = server_url
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
    server_url, _ = server_url
    req = urllib.request.Request(server_url + "/generate", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_info(server_url):
    server_url, _ = server_url
    with urllib.request.urlopen(server_url + "/info") as r:
        data = json.loads(r.read())
    assert data["backend"]["name"] == "cpu"
    assert data["requests"] >= 1


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        ctype = r.headers["Content-Type"]
        body = r.read()
    return ctype, body


def test_generate_json_base64(server_url):
    server_url, _ = server_url
    ctype, body = _post(server_url, "/generate",
                        {"prompt": "a dog", "seed": 9, "format": "json",
                         "batch_size": 2})
    assert ctype == "application/json"
    data = json.loads(body)
    assert len(data["images"]) == 2
    assert len(data["infotexts"]) == 2
    assert "Seed: 9" in data["infotexts"][0]
    assert "Seed: 10" in data["infotexts"][1]  # seed+j per image
    import base64
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(data["images"][0])))
    assert img.size == (64, 64)


def test_concurrent_requests_share_a_batch(server_url):
    """Two concurrent compatible requests are merged into one device batch
    (VERDICT r1 item 9)."""
    server_url, srv = server_url
    merged0 = srv.n_merged
    results = []

    def post(seed):
        ctype, body = _post(server_url, "/generate",
                            {"prompt": "a bird", "seed": seed,
                             "format": "json"})
        results.append(json.loads(body))

    ts = [threading.Thread(target=post, args=(s,)) for s in (21, 22)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 2
    assert srv.n_merged == merged0 + 1  # second request rode the first batch


def test_batch_merge_matches_single(server_url):
    """A merged request's image equals the same request run alone."""
    server_url, _ = server_url
    _, body1 = _post(server_url, "/generate",
                     {"prompt": "a tree", "seed": 77, "format": "json"})
    img1 = json.loads(body1)["images"][0]
    _, body2 = _post(server_url, "/generate",
                     {"prompt": "a tree", "seed": 77, "format": "json"})
    assert json.loads(body2)["images"][0] == img1


def test_cancel_queue_and_running():
    """Cancellation semantics, deterministically (no worker thread)."""
    from mlimgsynth_tpu.server import Server, _Pending

    class _FakeSession:
        pass

    srv = Server(_FakeSession(), start_worker=False)
    p1 = srv.submit({"prompt": "a", "request_id": "r1"})
    p2 = srv.submit({"prompt": "b", "request_id": "r2"})
    assert srv.cancel("r2") == "dequeued"
    assert p2.event.is_set() and p2.error == "cancelled"
    assert [q.id for q in srv.queue] == ["r1"]
    # running request: flagged, aborts via the step callback
    with srv.cond:
        srv.queue.remove(p1)  # the worker pops before running
    with srv.running_lock:
        srv.running = [p1]
    assert srv.cancel("r1") == "cancelling"
    assert p1.cancelled and not p1.event.is_set()
    assert srv.cancel("nope") == "not found"


def test_incompatible_requests_not_merged():
    from mlimgsynth_tpu.server import Server

    class _FakeSession:
        pass

    srv = Server(_FakeSession(), start_worker=False)
    a = srv.submit({"prompt": "x", "steps": 2})
    b = srv.submit({"prompt": "y", "steps": 3})
    assert a.shared != b.shared
    c = srv.submit({"prompt": "z", "steps": 2})
    assert a.shared == c.shared


def test_generate_img2img_b64(server_url):
    """img2img through the serving path: base64 init image + f_t_ini."""
    import base64
    from PIL import Image
    server_url, _ = server_url
    rng = __import__("numpy").random.default_rng(0)
    arr = (rng.random((64, 64, 3)) * 255).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    ctype, body = _post(server_url, "/generate",
                        {"prompt": "a boat", "seed": 5, "format": "json",
                         "image": b64, "f_t_ini": 0.6})
    data = json.loads(body)
    assert len(data["images"]) == 1
    assert "img2img" in data["infotexts"][0]
    # different strength -> different merge bucket and different image
    _, body2 = _post(server_url, "/generate",
                     {"prompt": "a boat", "seed": 5, "format": "json",
                      "image": b64, "f_t_ini": 0.3})
    assert json.loads(body2)["images"][0] != data["images"][0]


def test_img2img_size_is_a_merge_key():
    """Different init-image sizes must never merge into one batch."""
    import base64
    from PIL import Image
    from mlimgsynth_tpu.server import Server

    def b64_img(size):
        buf = io.BytesIO()
        Image.new("RGB", (size, size)).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    class _FakeSession:
        c = {"width": 0, "height": 0}

        def option_get(self, name):
            return None

    srv = Server(_FakeSession(), start_worker=False)
    a = srv.submit({"prompt": "x", "image": b64_img(64)})
    b = srv.submit({"prompt": "y", "image": b64_img(128)})
    assert a.shared != b.shared
    # bad size fails fast with a clean error, not a doomed compile
    with pytest.raises(ValueError, match="multiple"):
        srv.submit({"prompt": "z", "image": b64_img(100)})


def test_omitted_shared_option_resets_to_launch_default(server_url):
    """A request omitting 'steps' gets the launch default, not the value a
    previous request set (review finding: order-dependent results)."""
    server_url, _ = server_url
    _, body1 = _post(server_url, "/generate",
                     {"prompt": "a", "seed": 1, "steps": 3, "format": "json"})
    assert "Steps: 3" in json.loads(body1)["infotexts"][0]
    _, body2 = _post(server_url, "/generate",
                     {"prompt": "a", "seed": 1, "format": "json"})
    # fixture launches the session with steps=2
    assert "Steps: 2" in json.loads(body2)["infotexts"][0]


def test_seedless_batch_entries_differ(server_url):
    """generate_batch gives seedless entries independent noise streams."""
    import jax.numpy as jnp
    server_url, srv = server_url
    imgs, infos = srv.session.generate_batch(
        [{"prompt": "a cat"}, {"prompt": "a cat"}])
    assert not np.allclose(imgs[0], imgs[1])


def test_generate_inpaint_b64(server_url):
    """Inpainting through the serving path: image + mask, masked region
    regenerated, unmasked region preserved."""
    import base64
    from PIL import Image
    server_url, _ = server_url
    np_ = __import__("numpy")
    rng = np_.random.default_rng(1)
    arr = (rng.random((64, 64, 3)) * 255).astype("uint8")

    def b64(a, mode="RGB"):
        buf = io.BytesIO()
        Image.fromarray(a, mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    mask = np_.zeros((64, 64), "uint8")
    mask[:32] = 255  # regenerate the top half only
    _, body = _post(server_url, "/generate",
                    {"prompt": "a moon", "seed": 5, "format": "json",
                     "image": b64(arr), "mask": b64(mask, "L"),
                     "f_t_ini": 0.8})
    data = json.loads(body)
    assert "Mode: inpaint" in data["infotexts"][0]
    # (pixel-region preservation is meaningless with random tiny-VAE
    # weights — latent-level mask semantics are covered by the api
    # inpaint tests; here we check the serving plumbing end-to-end)
    # deterministic: the same inpaint request reproduces exactly
    _, body_again = _post(server_url, "/generate",
                          {"prompt": "a moon", "seed": 5, "format": "json",
                           "image": b64(arr), "mask": b64(mask, "L"),
                           "f_t_ini": 0.8})
    assert json.loads(body_again)["images"][0] == data["images"][0]
    # and the mask changes the output vs plain img2img
    _, body_nomask = _post(server_url, "/generate",
                           {"prompt": "a moon", "seed": 5, "format": "json",
                            "image": b64(arr), "f_t_ini": 0.8})
    assert json.loads(body_nomask)["images"][0] != data["images"][0]

    # mask without image is a clean error
    import urllib.error
    req = urllib.request.Request(
        server_url + "/generate",
        data=json.dumps({"prompt": "x", "mask": b64(mask, "L")}).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_multi_model_routing(tmp_path, monkeypatch):
    """Requests route to the session named by their 'model' key."""
    import jax.numpy as jnp
    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu.server import Server
    from helpers import TINY_MODEL_TYPE, patch_tiny_model_types, \
        write_tiny_checkpoint
    patch_tiny_model_types(monkeypatch)

    def mk(path, seed):
        write_tiny_checkpoint(path, seed=seed)
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(path))
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        return s

    srv = Server({"a": mk(tmp_path / "a.st", 0),
                  "b": mk(tmp_path / "b.st", 1)}, merge_window_s=0)
    pa = srv.submit({"prompt": "x", "seed": 3, "model": "a"})
    pa.event.wait(600)
    pb = srv.submit({"prompt": "x", "seed": 3, "model": "b"})
    pb.event.wait(600)
    pd = srv.submit({"prompt": "x", "seed": 3})  # default = first entry
    pd.event.wait(600)
    assert pa.error is None and pb.error is None and pd.error is None
    assert not np.allclose(pa.imgs, pb.imgs)   # different weights
    np.testing.assert_array_equal(pa.imgs, pd.imgs)  # default routes to 'a'
    # unknown model rejected at submit
    with pytest.raises(ValueError, match="unknown model"):
        srv.submit({"prompt": "x", "model": "zzz"})
    # different models never merge
    assert srv.submit({"prompt": "q", "model": "a"}).shared != \
        srv.submit({"prompt": "q", "model": "b"}).shared


def test_index_page(server_url):
    """GET / serves the minimal web UI (reference README future-plans item:
    'API server and minimal web UI')."""
    import urllib.request
    server_url, _ = server_url
    with urllib.request.urlopen(server_url + "/", timeout=30) as r:
        body = r.read().decode()
        assert r.headers["Content-Type"].startswith("text/html")
    assert "/generate" in body and "/cancel" in body
    assert "mlimgsynth-tpu" in body


def test_warmup_generate(server_url):
    """warmup_generate compiles the serving path via one throwaway run."""
    from mlimgsynth_tpu.server import warmup_generate
    _, srv = server_url
    ses = next(iter(srv.sessions.values()))
    dt = warmup_generate(ses)
    assert dt >= 0.0


def test_streaming_preview(server_url):
    """'preview': true streams per-chunk frames via GET /preview while
    /generate blocks (VERDICT r2 item 7).  No TAE on the tiny session, so
    frames are the latent->RGB approximation at latent resolution (8x8)."""
    import base64
    import time as _time
    from PIL import Image
    server_url, srv = server_url
    rid = "pvtest1"
    frames = []

    def poll():
        deadline = _time.time() + 120
        while _time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        server_url + f"/preview?request_id={rid}",
                        timeout=10) as r:
                    j = json.loads(r.read())
                if j.get("images"):
                    frames.append(j)
            except Exception:
                pass  # 404 after completion ends the poller via the flag
            if done.is_set():
                return
            _time.sleep(0.05)

    done = threading.Event()
    t = threading.Thread(target=poll)
    t.start()
    req = urllib.request.Request(
        server_url + "/generate",
        data=json.dumps({"prompt": "a dog", "seed": 11, "steps": 4,
                         "preview": True, "preview_every": 1,
                         "format": "json", "request_id": rid}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        out = json.loads(r.read())
    done.set()
    t.join()
    assert out["images"], "final image missing"
    assert frames, "no preview frames observed during generation"
    last = frames[-1]
    assert 1 <= last["step"] <= last["n_step"] == 4
    # intermediate frames are the latent->RGB approximation at latent
    # resolution (8x8); the FINAL chunk's frame is the real decode (64x64),
    # so a fast poller may legitimately catch one 64x64 frame at step n.
    sizes = [(f["step"],
              Image.open(io.BytesIO(base64.b64decode(f["images"][0]))).size)
             for f in frames]
    assert all(sz == (8, 8) for step, sz in sizes if step < 4), sizes
    assert any(sz == (8, 8) for _, sz in sizes) or sizes[-1][0] == 4, sizes

    # finished requests are gone from /preview
    try:
        with urllib.request.urlopen(
                server_url + f"/preview?request_id={rid}", timeout=10) as r:
            assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_preview_is_a_merge_key():
    """preview and non-preview requests never share a device batch."""
    from mlimgsynth_tpu.server import _shared_of
    a = _shared_of({"prompt": "x", "preview": True})
    b = _shared_of({"prompt": "x"})
    assert a != b


def test_build_sessions_opt_passthrough(tmp_path, monkeypatch):
    """Launch-time -o NAME=VALUE options reach every session through the
    string-option surface (parallelism axes, aux files, any option)."""
    from mlimgsynth_tpu.server import build_sessions

    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "m1.safetensors"
    write_tiny_checkpoint(ckpt)
    ckpt2 = tmp_path / "m2.safetensors"
    write_tiny_checkpoint(ckpt2)

    sessions = build_sessions(
        [f"a={ckpt}", f"b={ckpt2}"], weight_type="f32",
        opts=["sp=2", "pp=1", "steps=3", "cfg-scale=4.5"])
    assert set(sessions) == {"a", "b"}
    for s in sessions.values():
        assert s.c["sp"] == 2 and s.c["pp"] == 1
        assert s.c["steps"] == 3 and s.c["cfg_scale"] == 4.5

    # single unnamed model gets the "default" name
    one = build_sessions([str(ckpt)])
    assert set(one) == {"default"}


# ---------------------------------------------------------------------------
# AUTOMATIC1111-compatible API (/sdapi/v1/*)
# ---------------------------------------------------------------------------

def test_sdapi_listings(server_url):
    server_url, _ = server_url
    import urllib.request
    models = json.loads(urllib.request.urlopen(
        server_url + "/sdapi/v1/sd-models").read())
    assert models and models[0]["model_name"]
    samplers = json.loads(urllib.request.urlopen(
        server_url + "/sdapi/v1/samplers").read())
    names = {s["name"].lower() for s in samplers}
    assert {"euler", "euler a", "dpm++ 2m", "unipc"} <= names
    opts = json.loads(urllib.request.urlopen(
        server_url + "/sdapi/v1/options").read())
    assert "sd_model_checkpoint" in opts
    prog = json.loads(urllib.request.urlopen(
        server_url + "/sdapi/v1/progress").read())
    assert "progress" in prog and "state" in prog


def test_sdapi_txt2img(server_url):
    import base64
    server_url, _ = server_url
    ctype, body = _post(server_url, "/sdapi/v1/txt2img",
                        {"prompt": "an astronaut", "steps": 2, "seed": 7,
                         "width": 64, "height": 64,
                         "sampler_name": "Euler a", "batch_size": 1,
                         "n_iter": 2})
    data = json.loads(body)
    assert len(data["images"]) == 2          # n_iter folds into the batch
    png = base64.b64decode(data["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    info = json.loads(data["info"])
    assert len(info["infotexts"]) == 2

    # Karras-suffixed sampler name maps method + scheduler
    _, body2 = _post(server_url, "/sdapi/v1/txt2img",
                     {"prompt": "an astronaut", "steps": 2, "seed": 7,
                      "width": 64, "height": 64,
                      "sampler_name": "DPM++ 2M Karras"})
    info2 = json.loads(json.loads(body2)["info"])
    assert "Karras" in info2["infotexts"][0] \
        or "karras" in info2["infotexts"][0].lower()

    # unsupported sampler -> clean 400
    import urllib.error
    import urllib.request
    try:
        _post(server_url, "/sdapi/v1/txt2img",
              {"prompt": "x", "sampler_name": "DDIM"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_sdapi_img2img(server_url):
    import base64
    from PIL import Image
    server_url, _ = server_url
    rng = __import__("numpy").random.default_rng(1)
    arr = (rng.random((64, 64, 3)) * 255).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    ctype, body = _post(server_url, "/sdapi/v1/img2img",
                        {"prompt": "a boat", "steps": 2, "seed": 5,
                         "init_images": ["data:image/png;base64," + b64],
                         "denoising_strength": 0.6})
    data = json.loads(body)
    assert len(data["images"]) == 1
    assert "img2img" in json.loads(data["info"])["infotexts"][0]


def test_openai_images_api(server_url):
    import base64
    server_url, _ = server_url
    ctype, body = _post(server_url, "/v1/images/generations",
                        {"prompt": "a lighthouse", "n": 2,
                         "size": "64x64", "seed": 4})
    data = json.loads(body)
    assert "created" in data and len(data["data"]) == 2
    png = base64.b64decode(data["data"][0]["b64_json"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    import urllib.error
    try:
        _post(server_url, "/v1/images/generations",
              {"prompt": "x", "response_format": "url"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_sdapi_options_switch_and_png_info(server_url):
    import base64
    import urllib.error
    server_url, srv = server_url

    # switch the default model (single-model fixture: name "default")
    ctype, body = _post(server_url, "/sdapi/v1/options",
                        {"sd_model_checkpoint": "default"})
    assert json.loads(body) == {}
    assert srv.default_model == "default"
    try:
        _post(server_url, "/sdapi/v1/options",
              {"sd_model_checkpoint": "nope"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised

    # png-info round-trip: infotext written by /generate comes back out
    ctype, png = _post(server_url, "/generate",
                       {"prompt": "metadata probe", "seed": 2})
    assert ctype == "image/png"
    _, body = _post(server_url, "/sdapi/v1/png-info",
                    {"image": base64.b64encode(png).decode()})
    info = json.loads(body)
    assert "metadata probe" in info["info"]
    assert "Steps:" in info["info"]


def test_init_resize_modes():
    from mlimgsynth_tpu.server import _init_resize
    t = np.zeros((1, 3, 100, 50), np.float32)
    t[:, :, :, :] = np.linspace(0, 1, 50)[None, None, None, :]
    # just resize: exact target dims
    assert _init_resize(t, 64, 64, 0).shape == (1, 3, 64, 64)
    # crop-to-fit: covers then center-crops (no distortion)
    c = _init_resize(t, 64, 64, 1)
    assert c.shape == (1, 3, 64, 64)
    # fill-to-fit: contains then pads with edge values
    f = _init_resize(t, 64, 64, 2)
    assert f.shape == (1, 3, 64, 64)
    # the tall 100x50 image scaled to fit 64x64 -> 64x32 wide pad bands
    assert np.allclose(f[0, 0, :, 0], f[0, 0, 0, 0])


def test_openai_multipart_and_mask():
    from mlimgsynth_tpu.server import (_openai_mask_to_gray,
                                       _parse_multipart)
    import io as _io
    from PIL import Image
    # build a multipart body by hand
    b = b"----testboundary"
    body = b"--" + b + b"\r\n" \
        b'Content-Disposition: form-data; name="prompt"\r\n\r\n' \
        b"a cat\r\n" \
        b"--" + b + b"\r\n" \
        b'Content-Disposition: form-data; name="image"; ' \
        b'filename="x.png"\r\nContent-Type: image/png\r\n\r\n' \
        b"PNGBYTES\r\n" \
        b"--" + b + b"--\r\n"
    fields = _parse_multipart(
        'multipart/form-data; boundary="----testboundary"', body)
    assert fields["prompt"] == "a cat"
    assert fields["image"] == b"PNGBYTES"

    # transparent areas of an OpenAI mask become white (repaint)
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:, :, 3] = 255
    rgba[2:4, 2:4, 3] = 0          # transparent = edit here
    buf = _io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, format="PNG")
    import base64 as b64mod
    gray = np.asarray(Image.open(_io.BytesIO(
        b64mod.b64decode(_openai_mask_to_gray(buf.getvalue())))))
    assert gray[3, 3] == 255 and gray[0, 0] == 0


def test_server_mask_inversion():
    """Served masks are white = REGENERATE; the library latent mask is
    1 = KEEP (reference src/sampling.c:98-110) — _run_batch must invert
    before mask_encode."""
    import base64
    from PIL import Image
    from mlimgsynth_tpu.server import Server

    rec = {}

    class _S:
        c = {"width": 64, "height": 64, "model": "m",
             "model_type": "sd1"}

        def option_set(self, *a):
            pass

        def option_get(self, name):
            return None

        def image_encode(self, imgs):
            return np.zeros((imgs.shape[0], 4, 8, 8), np.float32)

        def mask_encode(self, m):
            rec["mask"] = np.array(m)
            return m[:, :, ::8, ::8]

        def generate_batch(self, entries, **kw):
            n = len(entries)
            return np.zeros((n, 3, 64, 64), np.float32), ["x"] * n

    srv = Server(_S(), start_worker=False)

    def b64(a, mode):
        buf = io.BytesIO()
        Image.fromarray(a, mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    arr = np.zeros((64, 64, 3), "uint8")
    mask = np.zeros((64, 64), "uint8")
    mask[:32] = 255        # repaint the top half
    p = srv.submit({"prompt": "x", "image": b64(arr, "RGB"),
                    "mask": b64(mask, "L")})
    with srv.cond:
        srv.queue.remove(p)
    srv._run_batch([p])
    assert p.error is None, p.error
    m = rec["mask"]
    assert np.allclose(m[0, 0, :32], 0.0)   # repaint -> keep=0
    assert np.allclose(m[0, 0, 32:], 1.0)   # untouched -> keep=1


def test_inpaint_latent_mask_direction(tmp_path, monkeypatch):
    """api-level: keep-mask (1) regions of the final latent equal the
    init latent exactly; repaint (0) regions do not."""
    import jax.numpy as jnp_
    from helpers import patch_tiny_model_types, write_tiny_checkpoint
    from mlimgsynth_tpu.api import MLImgSynth
    patch_tiny_model_types(monkeypatch)
    ckpt = tmp_path / "sd1.safetensors"
    write_tiny_checkpoint(ckpt)
    s = MLImgSynth()
    s._dtype = jnp_.float32
    s.option_set("model", str(ckpt))
    s.option_set("model-type", "sd1")
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    init = np.random.RandomState(0).randn(1, 4, 8, 8).astype(np.float32)
    lmask = np.ones((1, 1, 8, 8), np.float32)
    lmask[:, :, :4] = 0.0          # repaint the top half
    lat, _ = s.generate_batch([{"prompt": "x", "seed": 4}],
                              init_latents=init, init_lmask=lmask,
                              _latent_only=True)
    lat = np.asarray(lat, np.float32)
    np.testing.assert_array_equal(lat[:, :, 4:], init[:, :, 4:])
    assert not np.allclose(lat[:, :, :4], init[:, :, :4])


def test_model_dir_hot_loading(tmp_path_factory):
    """--model-dir discovery + lazy session creation: a request naming a
    checkpoint in the directory hot-loads it; sd-models lists it."""
    import socket
    import urllib.error
    from http.server import ThreadingHTTPServer
    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu import api as api_mod
    from mlimgsynth_tpu.server import Server, make_handler
    from mlimgsynth_tpu.testing import TINY_MODEL_TYPE

    mdir = tmp_path_factory.mktemp("zoo")
    write_tiny_checkpoint(mdir / "main.safetensors")
    write_tiny_checkpoint(mdir / "extra.safetensors")
    orig = api_mod._model_types
    api_mod._model_types = lambda: {"sd1": TINY_MODEL_TYPE}
    try:
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(mdir / "main.safetensors"))
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        srv = Server(s, model_dir=str(mdir))
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(url + "/sdapi/v1/sd-models") as r:
            names = [m["model_name"] for m in json.loads(r.read())]
        assert "default" in names and "extra" in names

        _, body = _post(url, "/generate",
                        {"prompt": "a cat", "seed": 2, "format": "json",
                         "model": "extra"})
        assert json.loads(body)["images"]
        assert "extra" in srv.sessions       # now resident
        assert srv.sessions["extra"]._dtype == jnp.float32

        # unknown name still errors cleanly
        req = urllib.request.Request(
            url + "/generate",
            data=json.dumps({"prompt": "x", "model": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
        httpd.shutdown()
    finally:
        api_mod._model_types = orig


def test_lora_embedding_listings(server_url, tmp_path):
    from safetensors.numpy import save_file
    server_url, srv = server_url
    ldir = tmp_path / "loras"; ldir.mkdir()
    save_file({"x": np.zeros((2, 2), np.float32)},
              str(ldir / "style.safetensors"))
    edir = tmp_path / "emb"; edir.mkdir()
    save_file({"emb_params": np.zeros((1, 8), np.float32)},
              str(edir / "concept.safetensors"))
    srv.session.option_set("lora-dir", str(ldir))
    srv.session.option_set("embed-dir", str(edir))
    with urllib.request.urlopen(server_url + "/sdapi/v1/loras") as r:
        loras = json.loads(r.read())
    assert [l["name"] for l in loras] == ["style"]
    with urllib.request.urlopen(server_url + "/sdapi/v1/embeddings") as r:
        embs = json.loads(r.read())
    assert "concept" in embs["loaded"]
    srv.session.option_set("lora-dir", "")
    srv.session.option_set("embed-dir", "")


def test_metrics_endpoint(server_url):
    server_url, srv = server_url
    _post(server_url, "/generate", {"prompt": "a hat", "seed": 1,
                                    "format": "json"})
    with urllib.request.urlopen(server_url + "/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert "mlis_requests_total" in text
    assert 'mlis_batch_seconds_bucket{le="+Inf"}' in text
    assert 'mlis_model_requests_total{model="default"}' in text
    # histogram count equals the number of executed batches
    import re
    count = int(re.search(r"mlis_batch_seconds_count (\d+)", text).group(1))
    inf = int(re.search(r'le="\+Inf"\} (\d+)', text).group(1))
    assert count == inf == srv.n_batches > 0


def test_a1111_override_settings_translation():
    from mlimgsynth_tpu.server import _a1111_to_req
    out = _a1111_to_req({"prompt": "p", "sampler_name": "Euler",
                         "override_settings": {
                             "CLIP_stop_at_last_layers": 2,
                             "sd_model_checkpoint": "sdxl"}})
    assert out["clip_skip"] == 2
    assert out["model"] == "sdxl"


def test_clip_skip_default_resolves_per_model(tmp_path_factory):
    """The launch-default snapshot must be taken AFTER model setup: an
    SD2-family model (default clip skip 2) served a clip_skip=1 request
    must return to skip 2 — not to the pre-resolution 0 — on the next
    plain request."""
    from http.server import ThreadingHTTPServer
    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu import api as api_mod
    from mlimgsynth_tpu.server import Server, make_handler
    from mlimgsynth_tpu.testing import TINY_MODEL_TYPE_SD2
    from helpers import write_checkpoint_sd2

    ckpt = tmp_path_factory.mktemp("m2") / "tiny2.safetensors"
    write_checkpoint_sd2(ckpt)
    orig = api_mod._model_types
    api_mod._model_types = lambda: {"sd2": TINY_MODEL_TYPE_SD2}
    try:
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(ckpt))
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        srv = Server(s)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{port}"
        _, b1 = _post(url, "/generate", {"prompt": "a", "seed": 1,
                                         "format": "json"})
        assert "Clip skip: 2" in json.loads(b1)["infotexts"][0]
        _, b2 = _post(url, "/generate", {"prompt": "a", "seed": 1,
                                         "format": "json",
                                         "clip_skip": 1})
        assert "Clip skip: 1" in json.loads(b2)["infotexts"][0]
        _, b3 = _post(url, "/generate", {"prompt": "a", "seed": 1,
                                         "format": "json"})
        assert "Clip skip: 2" in json.loads(b3)["infotexts"][0]
        # identical requests around the explicit-skip one agree exactly
        assert json.loads(b3)["images"] == json.loads(b1)["images"]
        httpd.shutdown()
    finally:
        api_mod._model_types = orig


def test_prompt_styles(server_url, tmp_path):
    from mlimgsynth_tpu.server import apply_styles, load_styles
    server_url, srv = server_url
    csv_path = tmp_path / "styles.csv"
    csv_path.write_text(
        "name,prompt,negative_prompt\n"
        'cinematic,"{prompt}, cinematic lighting, 35mm",blurry\n'
        "anime,anime style,photo\n")
    styles = load_styles(str(csv_path))
    assert set(styles) == {"cinematic", "anime"}
    p, n = apply_styles(styles, ["cinematic"], "a cat", "")
    assert p == "a cat, cinematic lighting, 35mm" and n == "blurry"
    p, n = apply_styles(styles, ["anime"], "a cat", "bad")
    assert p == "a cat, anime style" and n == "bad, photo"
    with pytest.raises(ValueError):
        apply_styles(styles, ["nope"], "x", "")

    srv.styles = styles
    try:
        with urllib.request.urlopen(
                server_url + "/sdapi/v1/prompt-styles") as r:
            rows = json.loads(r.read())
        assert rows[0]["name"] == "anime"
        _, body = _post(server_url, "/generate",
                        {"prompt": "a cat", "seed": 2, "format": "json",
                         "styles": ["cinematic"]})
        info = json.loads(body)["infotexts"][0]
        assert "cinematic lighting" in info
        assert "Negative prompt: blurry" in info
    finally:
        srv.styles = {}


def test_serving_concurrency_stress(tmp_path, monkeypatch):
    """Serving concurrency stress (VERDICT r3 item 7): N parallel HTTP
    clients against one live 2-model server — mixed models, /generate and
    /sdapi/v1/txt2img dialects, a streamed-preview request, and mid-flight
    cancels.  Every request must either return a valid image or report a
    clean cancellation; the server must stay healthy throughout (no
    deadlocks, no 5xx, metrics still served afterwards)."""
    import time as _time
    from http.server import ThreadingHTTPServer
    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu.server import Server, make_handler
    patch_tiny_model_types(monkeypatch)

    def mk(path, seed):
        write_tiny_checkpoint(path, seed=seed)
        s = MLImgSynth()
        s._dtype = jnp.float32
        s.option_set("model", str(path))
        s.option_set("image-dim", 64)
        s.option_set("steps", 2)
        return s

    srv = Server({"a": mk(tmp_path / "a.st", 0),
                  "b": mk(tmp_path / "b.st", 1)}, merge_window_s=0.05)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        results, errors = [], []
        lock = threading.Lock()

        def post_json(path, obj, timeout=600):
            req = urllib.request.Request(
                url + path, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, json.loads(r.read())

        def client(i):
            try:
                model = "a" if i % 2 == 0 else "b"
                if i % 4 == 3:     # A1111 dialect
                    st, out = post_json("/sdapi/v1/txt2img",
                                        {"prompt": f"stress {i}",
                                         "seed": 100 + i, "steps": 2})
                    ok = st == 200 and out["images"]
                else:
                    st, out = post_json("/generate",
                                        {"prompt": f"stress {i}",
                                         "seed": 100 + i, "format": "json",
                                         "model": model})
                    ok = st == 200 and out["images"]
                with lock:
                    results.append(("gen", i, bool(ok)))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(("gen", i, repr(e)))

        def cancel_client(i):
            rid = f"stress-cancel-{i}"

            def axe():
                _time.sleep(0.02)
                for _ in range(50):
                    st, out = post_json("/cancel", {"request_id": rid},
                                        timeout=30)
                    if out["status"] != "not found":
                        return
                    _time.sleep(0.02)
            t = threading.Thread(target=axe)
            t.start()
            try:
                st, out = post_json("/generate",
                                    {"prompt": f"victim {i}", "seed": i,
                                     "format": "json", "request_id": rid,
                                     "model": "b"})
                with lock:      # raced to completion before the axe: fine
                    results.append(("cancel-late", i, True))
            except urllib.error.HTTPError as e:
                body = e.read().decode(errors="replace")
                with lock:      # clean cancellation error, not a 5xx crash
                    results.append(("cancelled", i,
                                    e.code < 500 and "cancel" in body))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(("cancel", i, repr(e)))
            t.join()

        def preview_client():
            rid = "stress-preview"
            frames = []
            done = threading.Event()

            def poll():
                while not done.is_set():
                    try:
                        with urllib.request.urlopen(
                                url + f"/preview?request_id={rid}",
                                timeout=10) as r:
                            j = json.loads(r.read())
                        if j.get("images"):
                            frames.append(j)
                    except Exception:  # noqa: BLE001 - 404 pre/post run
                        pass
                    _time.sleep(0.02)
            pt = threading.Thread(target=poll)
            pt.start()
            try:
                st, out = post_json("/generate",
                                    {"prompt": "preview stress", "seed": 7,
                                     "steps": 4, "preview": True,
                                     "preview_every": 1, "format": "json",
                                     "request_id": rid, "model": "a"})
                with lock:
                    results.append(("preview", 0, st == 200
                                    and bool(out["images"])))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(("preview", 0, repr(e)))
            finally:
                done.set()
                pt.join()

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        threads += [threading.Thread(target=cancel_client, args=(i,))
                    for i in range(2)]
        threads += [threading.Thread(target=preview_client)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(1200)
            assert not t.is_alive(), "stress client deadlocked"

        assert not errors, errors
        assert len(results) == 11
        assert all(ok for _, _, ok in results), results
        # server still healthy and metrics served
        with urllib.request.urlopen(url + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
            body = r.read().decode()
        assert "mlis_requests_total" in body
        # and it still serves a fresh request after the storm
        st, out = post_json("/generate", {"prompt": "after", "seed": 1,
                                          "format": "json", "model": "b"})
        assert st == 200 and out["images"]
    finally:
        httpd.shutdown()


def test_server_sd3_flow_model(tmp_path, monkeypatch):
    """A rectified-flow model (tiny SD3) served end-to-end: the batched
    queue path assembles flow conditioning (dual towers + zero-T5 rows +
    pooled label) and the A1111 dialect works against it."""
    import socket
    from http.server import ThreadingHTTPServer
    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu.server import Server, make_handler
    from mlimgsynth_tpu.testing import (TINY_MODEL_TYPE_SD3,
                                        write_checkpoint_sd3)

    ckpt = tmp_path / "tiny-sd3.safetensors"
    write_checkpoint_sd3(ckpt)
    patch_tiny_model_types(monkeypatch, {"sd3": TINY_MODEL_TYPE_SD3})
    s = MLImgSynth()
    s._dtype = jnp.float32
    s.option_set("model", str(ckpt))
    s.option_set("image-dim", 64)
    s.option_set("steps", 2)
    srv = Server(s, merge_window_s=0.1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            url + "/sdapi/v1/txt2img",
            data=json.dumps({"prompt": "a flow scene", "seed": 3,
                             "steps": 2, "cfg_scale": 4.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            data = json.loads(r.read())
        assert data["images"]
        import base64
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(data["images"][0])))
        assert img.size == (64, 64)
    finally:
        httpd.shutdown()
