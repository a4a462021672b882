#!/usr/bin/env python3
"""Per-step latent trace for cross-implementation parity checking.

Runs a generation step-by-step and, after every solver step, prints the
reference-format stat line (asum + 8-char segment hash + first element,
comparable with the reference's ``--debug`` ``x`` lines at the same seed,
src/sampling.c:180) and optionally saves each latent as a TENSOR file.

Usage:
  python tools/latent_trace.py -m MODEL [-p PROMPT] [-S SEED] [-s STEPS]
      [--save-dir DIR] [--method euler] [--cfg-scale 7]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="a photograph of an astronaut "
                    "riding a horse")
    ap.add_argument("-n", "--nprompt", default="")
    ap.add_argument("-S", "--seed", type=int, default=42)
    ap.add_argument("-s", "--steps", type=int, default=20)
    ap.add_argument("-d", "--dim", type=int, default=0)
    ap.add_argument("--method", default="euler")
    ap.add_argument("--scheduler", default="uniform")
    ap.add_argument("--cfg-scale", type=float, default=7.0)
    ap.add_argument("--weight-type", default="")
    ap.add_argument("--save-dir", default="")
    args = ap.parse_args()

    from mlimgsynth_tpu.api import MLImgSynth
    from mlimgsynth_tpu.utils import image as image_mod
    from mlimgsynth_tpu.utils.compcache import enable
    from mlimgsynth_tpu.utils.tensorstat import stat_line
    enable()

    s = MLImgSynth()
    s.option_set("model", args.model)
    s.option_set("seed", args.seed)
    s.option_set("steps", args.steps)
    s.option_set("method", args.method)
    s.option_set("scheduler", args.scheduler)
    s.option_set("cfg-scale", args.cfg_scale)
    s.option_set("no-decode", True)
    if args.dim:
        s.option_set("image-dim", args.dim)
    if args.nprompt:
        s.option_set("nprompt", args.nprompt)
    if args.weight_type:
        s.option_set("weight-type", args.weight_type)
    s.option_set("prompt", args.prompt)

    def observe(i_step, latent):
        print(stat_line(latent, "x"))
        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            image_mod.tensor_save(
                os.path.join(args.save_dir, f"x_{i_step:03d}.tensor"), latent)

    s.step_observer = observe
    s.generate()
    print(stat_line(s.tensors["cond"], "cond"))
    print(stat_line(s.tensors["latent"], "x_final"))


if __name__ == "__main__":
    main()
