import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile and execute without TPU hardware. Force (not setdefault): the outer
# environment pins JAX_PLATFORMS to the remote TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"

# The remote-TPU PJRT plugin (injected via PYTHONPATH) hooks compilation and
# slows CPU compiles ~8x; keep it out of test processes entirely.
import sys

sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env-injected PJRT plugin registers itself at interpreter start and can
# override JAX_PLATFORMS; pin the platform explicitly after import.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles are slow in this environment (~0.5s per unique op-shape even on
# CPU); a persistent cache makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_streamflow")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
