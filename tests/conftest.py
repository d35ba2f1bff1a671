"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The host image's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
TPU plugin, so env vars alone don't stick — override via jax.config before
any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
