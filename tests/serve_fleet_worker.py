"""Subprocess worker for the 2-process bulk-serving fleet test
(see test_multihost.py::test_two_process_serve_fleet_cli).

Boots a CPU-pinned JAX (the host sitecustomize pins the TPU plugin, so the
config update must run before any backend init) and then drives the REAL
``cli.serve`` entry point with ``--multihost`` fleet flags.

Usage: python serve_fleet_worker.py <cli-args...>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sequoia_tpu.cli import serve  # noqa: E402

if __name__ == "__main__":
    serve.main(sys.argv[1:])
