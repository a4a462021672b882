#!/usr/bin/env python3
"""Forwarder kept at the reference's path; the game lives in demos/."""
import os
import runpy
import sys

sys.argv[0] = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "demos", "guessing_game.py")
runpy.run_path(sys.argv[0], run_name="__main__")
