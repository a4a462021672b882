"""Persistent XLA compilation cache setup.

First compilation of the fused 20-step sampling loop takes minutes; the
persistent cache makes subsequent process launches start hot.  Enabled by the
CLI and bench; opt out with MLIS_NO_COMPILE_CACHE=1 or relocate with
MLIS_COMPILE_CACHE=dir.

CPU-forced processes (the test suite, host tools) get a subdirectory keyed
by a fingerprint of the host CPU's feature flags: XLA:CPU AOT results do
NOT key on the target machine features, so a cache written on one host is
happily loaded on another ("Machine type used for XLA:CPU compilation
doesn't match the machine type for execution ... could lead to execution
errors such as SIGILL") — observed here as sporadic test-suite segfaults
when ~/.cache survived a change of host.  TPU cache entries are unaffected
(compiled device-side; moving hosts must not discard them — warming the
flux synth cache alone costs ~13 min).
"""
import os


def _host_cpu_tag():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine() or "unknown"


def enable(readonly: bool = False):
    """``readonly=True`` keeps cache READS but disables writes by raising
    the min-compile-time gate above any real compile (the gate is checked
    BEFORE ``executable.serialize()`` in jax's _cache_write).  XLA:CPU AOT
    serialization AND deserialization both segfault probabilistically in
    long many-compile processes (three full-suite crashes; stacks in
    put_executable_and_time / get_executable_and_time), which is why the
    test suite does not enable this at all by default (conftest.py:
    MLIS_TEST_CACHE=1 opts in, + MLIS_TEST_CACHE_WRITE=1 to write)."""
    if os.environ.get("MLIS_NO_COMPILE_CACHE"):
        return
    path = os.environ.get(
        "MLIS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mlimgsynth_tpu",
                     "xla"))
    try:
        import jax
        # Partition by the ACTUAL backend, not JAX_PLATFORMS: a TPU
        # process that falls back to CPU (axon relay outage) must not
        # write machine-feature-less XLA:CPU AOT entries into the shared
        # TPU dir — after a host swap those entries SIGILL on load.
        # default_backend() initializes the backend; every caller of
        # enable() is about to do that anyway.
        if jax.default_backend() == "cpu":
            path = os.path.join(path, "cpu-" + _host_cpu_tag())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e9 if readonly else 0.5)
    except Exception:  # cache is an optimization, never fatal
        pass
