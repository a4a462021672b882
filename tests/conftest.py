import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# transformers must not pull TensorFlow/Flax into a process that already
# hosts jax+torch (TF+JAX in one process segfaults in libgcc unwinding —
# observed in full-suite runs once the parity tests import transformers)
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_FLAX", "0")
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")  # never dial the TPU relay
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compile cache: the suite spends most of its wall time
# recompiling the same tiny-model jits every run; with the cache warm it
# runs in a fraction of the cold time.  READ-ONLY by default: XLA:CPU
# executable serialization segfaults probabilistically in long
# many-compile processes (utils/compcache.py docstring).  Warm the cache
# with MLIS_TEST_CACHE_WRITE=1 (retry if the warming pass crashes —
# entries persist up to the crash point, so it converges).
from mlimgsynth_tpu.utils.compcache import enable as _compcache_enable  # noqa: E402

_compcache_enable(readonly=not os.environ.get("MLIS_TEST_CACHE_WRITE"))
