#!/usr/bin/env python3
"""Library usage demo: txt2img -> img2img -> latent-space inpainting chain.

Python counterpart of the reference's C demo (reference:
src/demo_mlimgsynth.c): three generations sharing one session, the second
reusing the first image, the third reusing the latent with a procedural
circular mask.

Usage: python demos/demo_mlimgsynth.py MODEL_FILE
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mlimgsynth_tpu.api import (MLImgSynth, STAGE_NAMES, TUF_IMAGE,
                                TUF_LATENT, TUF_LMASK)
from mlimgsynth_tpu.utils import image as image_mod


def img_save(ctx, name):
    img = image_mod.tensor_to_image_arr(ctx.tensors["image"])
    image_mod.image_save(f"{name}.png", img, ctx.infotext)
    with open(f"{name}.txt", "w") as f:
        f.write(ctx.infotext)
    print(f"saved {name}.png")


def progress(ctx, prg):
    etc = (prg["step_end"] - prg["step"]) * prg["step_time"] \
        if prg["step"] > 1 else -1.0
    print(f"{STAGE_NAMES[prg['stage']]} {prg['step']}/{prg['step_end']} "
          f"nfe={prg['nfe']} {{{prg['step_time']:.3f}s}} ETC {etc:.0f}s")
    return 0


def demo_txt2img(ctx):
    print("txt2img")
    ctx.option_set("prompt",
                   "a photograph of an astronaut riding a horse in a "
                   "grassland")
    ctx.generate()
    img_save(ctx, "demo_txt2img")


def demo_img2img(ctx):
    print("img2img")
    ctx.option_set("prompt",
                   "a photograph of an astronaut riding a horse in a forest")
    ctx.option_set("f-t-ini", 0.70)  # strength
    # reuse the previously generated image
    ctx.c["tuflags"] |= TUF_IMAGE
    ctx.generate()
    img_save(ctx, "demo_img2img")


def demo_inpaint(ctx):
    print("inpaint")
    ctx.option_set("prompt", "a pile of gold coins")
    ctx.option_set("no-decode", True)
    ctx.generate()
    ctx.option_set("no-decode", False)

    # circular latent mask: regenerate everything except the center disk
    latent = ctx.tensors["latent"]
    _, _, h, w = latent.shape
    yy, xx = np.mgrid[0:h, 0:w]
    r0, r1 = w // 2, h // 2
    mask = (((xx - r0) ** 2 + (yy - r1) ** 2) > r1 * r1).astype(np.float32)
    ctx.tensors["lmask"] = mask[None, None]

    ctx.option_set("prompt", "a red dragon on a pile of gold coins")
    ctx.option_set("f-t-ini", 0.70)
    ctx.option_set("tensor-use-flags", TUF_LATENT | TUF_LMASK)
    ctx.generate()
    img_save(ctx, "demo_inpaint")


def main():
    if len(sys.argv) != 2:
        sys.exit(f"Usage: {sys.argv[0]} MODEL_FILE")
    print("Initializing...")
    ctx = MLImgSynth()
    ctx.option_set("callback", progress)
    ctx.option_set("model", sys.argv[1])
    ctx.option_set("image-dim", 768, 512)
    ctx.option_set("seed", 42)
    ctx.option_set("method", "euler")
    ctx.option_set("scheduler", "uniform")
    ctx.option_set("steps", 20)
    ctx.option_set("cfg-scale", 7.0)
    ctx.option_set("s-ancestral", 1.0)
    ctx.setup()

    demo_txt2img(ctx)
    demo_img2img(ctx)
    demo_inpaint(ctx)
    print("End")


if __name__ == "__main__":
    main()
