"""Subprocess worker for the 2-process DCN test (see test_multihost.py).

Runs one sharded ViS AdamW training step on a global (hosts x chips) mesh:
4 virtual CPU devices per process, 2 processes -> mesh data=4 x model=2
with the model (gene-head TP) axis inside each "host".  Prints the step
loss; the parent asserts both processes print the SAME loss and that it
matches a single-process run over the identical global batch.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import PartitionSpec as P  # noqa: E402

from sequoia_tpu.models import vis  # noqa: E402
from sequoia_tpu.parallel import multihost, sharding as sh  # noqa: E402
from sequoia_tpu.train import loop  # noqa: E402
from tests.multihost_case import CASE, local_shard  # noqa: E402


def main() -> None:
    multihost.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc
    mesh = multihost.make_global_mesh(n_model=2)
    assert mesh.devices.shape == (nproc * 4 // 2, 2)
    # model groups must be host-local: both devices of each row on one process
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, "TP crosses DCN!"

    cfg = vis.ViSConfig(**CASE["vis"])
    params = vis.init(cfg, jax.random.PRNGKey(0))
    optimizer = loop.make_adamw(1e-3)
    opt_state = optimizer.init(params)
    params = sh.shard_params(mesh, params)
    opt_state = sh.shard_opt_state(mesh, opt_state, params)

    feats, rna, valid = local_shard(pid, nproc)
    batch = multihost.global_batch(
        mesh,
        {"feats": feats, "rna": rna, "valid": valid},
        {"feats": P("data"), "rna": P("data", "model"), "valid": P("data")})

    train_step, _ = loop.make_step_fns(
        lambda p, x: vis.apply(cfg, p, x), optimizer)
    params, opt_state, metrics = train_step(
        params, opt_state, batch["feats"], batch["rna"], batch["valid"])
    jax.block_until_ready(metrics)
    out = multihost.fold_local_metrics(metrics)
    # row-shard range check: the fleet data-plane protocol
    start, end = multihost.process_shard(10)
    print(f"RESULT pid={pid} loss={out['loss']:.10f} corr={out['corr']:.10f} "
          f"shard={start}:{end}", flush=True)


if __name__ == "__main__":
    main()
