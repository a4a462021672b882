#!/usr/bin/env python3
"""Web "guess the prompt" game (reference: python/guessing_game.py).

Serves a locally generated image; the player guesses the prompt and is scored
by CLIP feature similarity (or word match without a text_projection tensor).

Usage: python demos/guessing_game.py -m MODEL [-p PORT]
"""
import argparse
import io
import logging
import os
import random
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qsl, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "python"))

from mlimgsynth import MLImgSynth  # the compat binding

ADJECTIVES = ["red", "blue", "green", "yellow"]
NOUNS = ["lion", "rabbit", "cow", "chicken", "cup", "table", "lamp", "book",
         "car"]
PLACES = ["in the mountains", "on a lake", "in a river", "on a beach",
          "in a forest", "in a city street", "in a cavern"]

PAGE = """<!DOCTYPE html><html><head><title>Guess the prompt</title></head>
<body style="font-family:sans-serif;text-align:center">
<h2>Guess the prompt</h2>
<img src="/image.png" style="max-width:512px"><br>
<form action="/guess" method="get">
<input name="text" size="50" placeholder="adjective noun place..."
 autofocus> <button>Guess</button></form>
<p>{status}</p>
<form action="/new" method="get"><button>New image</button></form>
</body></html>"""


class Game:
    def __init__(self, mlis):
        self.mlis = mlis
        self.prompt_elems = []
        self.png = b""
        self.status = "Guess what prompt generated this image!"

    def generate(self):
        self.prompt_elems = [random.choice(e)
                             for e in (ADJECTIVES, NOUNS, PLACES)]
        prompt = " ".join(self.prompt_elems)
        logging.info("prompt: %s", prompt)
        self.mlis.option_set("prompt", prompt)
        self.mlis.generate()
        img = self.mlis.image_get()
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img.d).save(buf, format="PNG")
        self.png = buf.getvalue()

    def guess(self, text):
        elems = [x.strip().lower() for x in text.split(maxsplit=2)]
        score = sum(int(x == y) for x, y in zip(elems, self.prompt_elems))
        score /= len(self.prompt_elems)
        self.status = f"'{text}': score {score:.2f}"
        if score == 1.0:
            self.status += " — perfect! Press 'New image' to play again."
        return score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--port", type=int, default=8080)
    ap.add_argument("-s", "--steps", type=int, default=20)
    ap.add_argument("-d", "--dim", type=int, default=512)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    mlis = MLImgSynth()
    mlis.option_set("model", args.model)
    mlis.option_set("image-dim", args.dim)
    mlis.option_set("steps", args.steps)
    mlis.option_set("cfg-scale", 7.0)
    game = Game(mlis)
    game.generate()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/image.png":
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(game.png)
                return
            if url.path == "/guess":
                q = dict(parse_qsl(url.query))
                game.guess(q.get("text", ""))
            elif url.path == "/new":
                game.status = "Generating..."
                game.generate()
                game.status = "New image ready — guess!"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.format(status=game.status).encode())

    print(f"Serving on http://localhost:{args.port}")
    HTTPServer(("127.0.0.1", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
