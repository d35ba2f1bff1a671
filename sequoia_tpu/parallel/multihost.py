"""Multi-host (DCN) recipe: fleet sharding + a global hosts x chips mesh.

The reference scales past one machine with filesystem job arrays — every
pre-processing CLI takes ``--start/--end`` row ranges and workers are
launched per range (reference ``pre_processing/patch_gen_hdf5.py:159-162``,
``compute_features_hdf5.py:29-30``, ``kmean_features.py:23-26``;
``README.md:59``).  The TPU-native equivalent has two tiers:

* **Data plane (feature-extraction fleet)** — stays embarrassingly
  parallel: each host process works a deterministic contiguous shard of the
  ref-file (:func:`process_shard`), producing the same per-slide HDF5
  artifacts and sentinels.  It is the job-array protocol with the range
  arithmetic derived from ``jax.process_index()`` so ONE command line
  serves the whole fleet (``--multihost`` in the pre-processing CLIs).

* **Compute plane (DP training / batched stages)** — one global
  ``('data', 'model')`` mesh over all hosts x chips
  (:func:`make_global_mesh`).  The ``model`` (gene-head TP) axis is laid
  out INSIDE a host so its all-reduces ride ICI; the ``data`` axis spans
  hosts, so what crosses DCN each step is one gradient psum of the
  replicated (non-head) params plus scalar metrics — the sharded gene-head
  grads and AdamW moments never leave their shard.  Host-local batches
  become global arrays with :func:`global_batch`
  (``jax.make_array_from_process_local_data``), so no host ever
  materializes the full batch.

Launch recipe (one command per host; validated 2-process on CPU in
``tests/test_multihost.py``)::

    # host i of N (e.g. via SLURM_PROCID / TPU pod metadata):
    python -m sequoia_tpu.cli.main --multihost \
        --coordinator <host0>:8476 --num_processes N --process_id i ...

On Cloud TPU pods ``jax.distributed.initialize()`` discovers all three
values from the metadata server — pass nothing.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` wrapper; no-op when already connected.

    On Cloud TPU all arguments are auto-discovered; on CPU/GPU fleets pass
    all three (the test suite drives a real 2-process CPU cluster through
    this path).
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and (num_processes is not None
                                        or process_id is not None):
        # partial spec would silently fall through to auto-detection and
        # fail with an unrelated coordinator-discovery error
        raise ValueError("--num_processes/--process_id need --coordinator "
                         "on CPU/GPU fleets (all three are auto-discovered "
                         "only on Cloud TPU)")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # idempotent: tolerate a live connection
        # jax wordings vary: "already initialized" (older) vs
        # "should only be called once" (jax>=0.9)
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise
    _initialized = True


_initialized = False


def process_shard(n_rows: int, process_index: int | None = None,
                  process_count: int | None = None) -> tuple[int, int]:
    """Deterministic contiguous ``[start, end)`` row range for this process.

    Balanced like ``np.array_split``: the first ``n_rows % P`` processes get
    one extra row.  This replaces hand-computed ``--start/--end`` job-array
    flags (reference ``patch_gen_hdf5.py:183-188``)."""
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_rows, n)
    start = p * base + min(p, extra)
    return start, start + base + (1 if p < extra else 0)


def make_global_mesh(n_model: int = 1, devices=None) -> Mesh:
    """Global ``('data', 'model')`` mesh over all hosts x chips.

    ``jax.devices()`` orders devices process-major, so a row-major reshape
    to ``(-1, n_model)`` keeps each ``model`` group inside one host
    (ICI-only TP collectives) as long as ``n_model`` divides the per-host
    device count; the ``data`` axis then spans hosts over DCN."""
    devices = list(jax.devices() if devices is None else devices)
    local = jax.local_device_count()
    if n_model > 1 and local % n_model != 0:
        raise ValueError(
            f"n_model={n_model} must divide local device count {local} so "
            "the gene-head TP group stays inside a host (ICI)")
    arr = np.asarray(devices).reshape(-1, n_model)
    return Mesh(arr, ("data", "model"))


def global_batch(mesh: Mesh, host_local_arrays: dict[str, np.ndarray],
                 specs: dict[str, P]) -> dict[str, jax.Array]:
    """Assemble global device arrays from per-process host-local batches.

    Each process passes its OWN batch shard (e.g. ``B_local`` slides); the
    result is a global array of ``B_local * process_count`` rows sharded
    over the mesh, with no host-side all-gather."""
    out = {}
    for k, x in host_local_arrays.items():
        s = NamedSharding(mesh, specs[k])
        out[k] = jax.make_array_from_process_local_data(s, np.asarray(x))
    return out


def fold_local_metrics(metrics: dict) -> dict[str, float]:
    """Host-readable scalars from (possibly distributed) metric arrays.

    Under ``jit`` with a global mesh the metric outputs are already fully
    reduced and replicated; this just pulls them to host floats on every
    process (identical values everywhere)."""
    return {k: float(np.asarray(v)) for k, v in metrics.items()}


# ---- CLI integration ------------------------------------------------------

def add_fleet_args(parser) -> None:
    """Fleet/multi-host flags shared by the pre-processing and train CLIs.

    ``--multihost`` replaces hand-computed ``--start/--end`` job-array
    ranges (and, for training, turns the mesh global); the coordinator
    triplet is only needed off-TPU (CPU/GPU clusters) — on Cloud TPU pods
    ``jax.distributed.initialize`` auto-discovers everything."""
    g = parser.add_argument_group("multi-host fleet")
    g.add_argument("--multihost", action="store_true",
                   help="shard work across jax.distributed processes")
    g.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 (omit on Cloud TPU)")
    g.add_argument("--num_processes", type=int, default=None)
    g.add_argument("--process_id", type=int, default=None)


def fleet_shard_rows(rows, args):
    """Slice a DataFrame or sequence to this process's shard when
    ``--multihost`` is set (after any manual ``--start/--end`` slicing)."""
    if not getattr(args, "multihost", False):
        return rows
    initialize(args.coordinator, args.num_processes, args.process_id)
    start, end = process_shard(len(rows))
    print(f"[multihost] process {jax.process_index()}/{jax.process_count()} "
          f"rows [{start}:{end}) of {len(rows)}")
    return rows.iloc[start:end] if hasattr(rows, "iloc") else rows[start:end]


def mesh_from_args(args, n_model: int = 1) -> Mesh | None:
    """Training-side mesh: global (hosts x chips) when ``--multihost``,
    else a local-device mesh; None if the caller wants single-device."""
    if getattr(args, "multihost", False):
        initialize(args.coordinator, args.num_processes, args.process_id)
        return make_global_mesh(n_model=n_model)
    return None
