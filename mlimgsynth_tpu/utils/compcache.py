"""Persistent XLA compilation cache setup.

First compilation of the fused 20-step sampling loop takes minutes; the
persistent cache makes subsequent process launches start hot.  Enabled by the
CLI and bench; opt out with MLIS_NO_COMPILE_CACHE=1 or relocate with
MLIS_COMPILE_CACHE=dir.
"""
import os


def enable():
    if os.environ.get("MLIS_NO_COMPILE_CACHE"):
        return
    path = os.environ.get(
        "MLIS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mlimgsynth_tpu",
                     "xla"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never fatal
        pass
