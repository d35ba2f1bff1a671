"""Subprocess worker for the 2-process feature-extraction fleet test
(see test_multihost.py::test_two_process_feature_fleet_cli).

Boots a CPU-pinned JAX (the host sitecustomize pins the TPU plugin, so the
config update must run before any backend init) and then drives the REAL
``cli.compute_features`` entry point with whatever argv the parent passes —
including ``--multihost --coordinator ... --num_processes N --process_id i``,
the job-array replacement (reference ``patch_gen_hdf5.py:159-188``).

Usage: python fleet_worker.py <cli-args...>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sequoia_tpu.cli import compute_features  # noqa: E402

if __name__ == "__main__":
    compute_features.main(sys.argv[1:])
