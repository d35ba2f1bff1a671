"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The host image's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
TPU plugin, so env vars alone don't stick — override via jax.config before
any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective" not in flags:
    # 8 virtual devices time-share this host's core(s): heavy per-shard
    # programs (production-shape dryrun legs) reach a collective minutes
    # apart, and XLA:CPU's default 40s rendezvous TERMINATION timeout
    # ABORTS the process.  Three distinct flags; the *_call_* pair governs
    # the in-process rendezvous CHECK that was firing (same trio in
    # __graft_entry__._get_devices for standalone runs)
    flags += (" --xla_cpu_collective_timeout_seconds=3600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiles.
# Keyed by a host-CPU fingerprint — sandbox sessions can migrate between
# machine generations, and XLA:CPU AOT entries compiled for another host's
# feature set load with SIGILL warnings.
def _host_fingerprint() -> str:
    import hashlib
    import platform

    # x86 exposes "flags", aarch64 "Features"; fold in the machine arch so
    # neither family ever hashes to an empty constant
    keys = ("flags", "Features", "model name", "CPU part")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for ln in f:
                k = ln.split(":")[0].strip()
                if k in keys and k not in seen:
                    seen.add(k)
                    lines.append(ln.strip())
    except OSError:
        pass
    blob = platform.machine() + "\n" + "\n".join(lines)
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser(f"~/.cache/sequoia_tpu_jax_{_host_fingerprint()}"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` is auto-tagged ``quick`` so
    ``pytest -m quick`` is the fast tier (unit/parity math, no training
    loops or e2e pipelines) and ``pytest tests/`` stays the full gate."""
    import pytest

    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.quick)
