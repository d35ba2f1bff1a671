"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Must set the env vars before the first ``import jax`` anywhere in the test
process.
"""

import os
import sys

# Unconditional: the host image's sitecustomize force-sets JAX_PLATFORMS to
# the TPU plugin; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
