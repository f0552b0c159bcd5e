"""Test bootstrap: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 implication). Must run
before jax initializes its backends, hence env mutation at import time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
