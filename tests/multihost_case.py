"""Shared fixture for the multi-host test: the model config and the
deterministic per-process batch shards (worker subprocesses and the
single-process oracle must build bit-identical data)."""

import numpy as np

CASE = {
    "vis": dict(num_outputs=32, input_dim=64, depth=2, nheads=4,
                dim_f=8, dim_s=8, dim_c=8, num_clusters=100),
    "batch_per_process": 4,
}


def local_shard(pid: int, nproc: int):
    """This process's host-local batch (features, rna, valid)."""
    b = CASE["batch_per_process"]
    cfg = CASE["vis"]
    rng = np.random.default_rng(100 + pid)
    feats = rng.normal(size=(b, cfg["num_clusters"],
                             cfg["input_dim"])).astype(np.float32)
    rna = rng.normal(size=(b, cfg["num_outputs"])).astype(np.float32)
    valid = np.ones((b,), bool)
    return feats, rna, valid


def global_arrays(nproc: int):
    """The full global batch = concatenated process shards (oracle view)."""
    parts = [local_shard(p, nproc) for p in range(nproc)]
    return tuple(np.concatenate([pt[i] for pt in parts]) for i in range(3))
