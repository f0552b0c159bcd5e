"""Test bootstrap: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 implication). Must run
before jax initializes its backends, hence env mutation at import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
# persistent compilation cache: the suite compiles small models repeatedly
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize registers the axon TPU plugin at interpreter
# startup and it wins over JAX_PLATFORMS; force the CPU backend explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the min_* env vars above are read by nothing in jax 0.9 (float/int_state
# without env plumbing); set the real config so small test executables are
# persisted too
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
