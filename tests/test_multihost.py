"""Multi-host (DCN) validation: a REAL 2-process jax.distributed cluster.

The reference's only cross-machine story is filesystem job arrays
(``--start/--end``, reference ``patch_gen_hdf5.py:159-162``).  These tests
validate the TPU-native replacement (``parallel/multihost.py``):

* two OS processes x 4 virtual CPU devices form one global
  (data=4, model=2) mesh with Gloo cross-process collectives;
* one sharded ViS AdamW step over a global batch assembled from host-local
  shards runs to the SAME loss on both processes;
* that loss matches a single-process oracle over the identical global batch
  (so DCN-DP == single-host math);
* the model/TP axis never crosses a process boundary (asserted in-worker);
* ``process_shard`` reproduces the job-array row protocol.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from sequoia_tpu.parallel import multihost

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_process_shard_protocol():
    # balanced contiguous cover, reference --start/--end semantics
    ranges = [multihost.process_shard(10, p, 4) for p in range(4)]
    assert ranges == [(0, 3), (3, 6), (6, 8), (8, 10)]
    covered = [i for s, e in ranges for i in range(s, e)]
    assert covered == list(range(10))
    assert multihost.process_shard(2, 3, 4) == (2, 2)  # empty tail shard ok


@pytest.mark.slow
def test_two_process_dcn_step_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) loss=([\d.eE+-]+) corr=([\d.eE+-]+) "
                      r"shard=(\d+):(\d+)", out)
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)),
                                    (int(m.group(4)), int(m.group(5))))

    # both processes observe the same fully-reduced metrics
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1]
    # and each derived its own job-array row range
    assert results[0][2] == (0, 5)
    assert results[1][2] == (5, 10)

    # single-process oracle over the identical global batch
    from sequoia_tpu.models import vis
    from sequoia_tpu.train import loop
    from tests.multihost_case import CASE, global_arrays

    cfg = vis.ViSConfig(**CASE["vis"])
    params = vis.init(cfg, jax.random.PRNGKey(0))
    optimizer = loop.make_adamw(1e-3)
    opt_state = optimizer.init(params)
    feats, rna, valid = global_arrays(2)
    train_step, _ = loop.make_step_fns(
        lambda p, x: vis.apply(cfg, p, x), optimizer)
    _, _, metrics = train_step(params, opt_state, feats, rna, valid)
    np.testing.assert_allclose(results[0][0], float(metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(results[0][1], float(metrics["corr"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_cli_main_mesh_flag(tmp_path, monkeypatch):
    """--mesh data=4,model=2 trains the CV flow on a sharded local mesh."""
    from sequoia_tpu.cli import main as cli_main
    from tests.test_data_and_train import make_store

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=10, n_genes=4, dim=8)
    df.to_csv(tmp_path / "ref_file.csv", index=False)
    monkeypatch.chdir(tmp_path)
    cli_main.main([
        "--ref_file", str(tmp_path / "ref_file.csv"),
        "--feature_path", str(store), "--model_type", "vis", "--depth", "1",
        "--num-heads", "2", "--k", "2", "--batch_size", "4",
        "--num_epochs", "1", "--train", "--exp_name", "meshed",
        "--mesh", "data=4,model=2"])
    assert (tmp_path / "saved_exp" / "TCGA" / "meshed"
            / "test_results.pkl").exists()


@pytest.mark.slow
def test_two_process_feature_fleet_cli(tmp_path):
    """The pre-processing data plane's job-array replacement, end-to-end:
    TWO OS processes run ``cli.compute_features --multihost`` against ONE
    synthetic patch store and must produce a complete, disjoint,
    sentinel-correct union of per-slide feature HDF5s (reference sharding:
    ``compute_features_hdf5.py:29-30`` + ``patch_gen_hdf5.py:183-188``)."""
    import h5py
    import pandas as pd

    n_slides, n_tiles, ps = 5, 6, 256
    rng = np.random.default_rng(0)
    patch_root = tmp_path / "patches"
    rows = []
    for i in range(n_slides):
        slide = f"FLEET_{i:02d}"
        d = patch_root / slide
        d.mkdir(parents=True)
        with h5py.File(d / f"{slide}.hdf5", "w") as f:
            for t in range(n_tiles):
                f.create_dataset(
                    f"{t * ps}_0",
                    data=rng.integers(0, 256, size=(ps, ps, 3), dtype=np.uint8))
        rows.append({"wsi_file_name": f"{slide}.svs", "patient_id": f"P{i}",
                     "tcga_project": "TCGA-FLEET", "rna_G0": 0.0})
    ref_csv = tmp_path / "ref.csv"
    pd.DataFrame(rows).to_csv(ref_csv, index=False)
    feat_root = tmp_path / "features"

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # --data_parallel under --multihost pins the regression where the mesh
    # was built from fleet-GLOBAL jax.devices() (device_put to another
    # process's non-addressable devices raised); it must use local devices
    argv = ["--feat_type", "resnet", "--weights", "random",
            "--ref_file", str(ref_csv), "--patch_data_path", str(patch_root),
            "--feature_path", str(feat_root), "--batch_size", "8",
            "--data_parallel",
            "--multihost", "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", "2"]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "fleet_worker.py"),
             *argv, "--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"fleet worker failed:\n{out}"

    # disjoint shards: each process worked its own contiguous row range
    assert "rows [0:3) of 5" in outs[0], outs[0]
    assert "rows [3:5) of 5" in outs[1], outs[1]
    assert "Extracted features for 3 slides" in outs[0]
    assert "Extracted features for 2 slides" in outs[1]
    for out in outs:  # no process ever re-visited the other's slides
        assert "features already obtained" not in out

    # complete union with correct contents + sentinels
    for i in range(n_slides):
        slide = f"FLEET_{i:02d}"
        d = feat_root / "TCGA-FLEET" / slide
        assert (d / "complete_tile.txt").exists()
        with h5py.File(d / f"{slide}.h5", "r") as f:
            assert f["resnet_features"].shape == (n_tiles, 2048)
            assert np.isfinite(f["resnet_features"][:]).all()


def test_fleet_shard_rows_noop_without_flag():
    import argparse

    import pandas as pd

    args = argparse.Namespace(multihost=False)
    df = pd.DataFrame({"a": range(5)})
    out = multihost.fleet_shard_rows(df, args)
    assert out is df


def test_two_process_serve_fleet_cli(tmp_path):
    """Bulk scoring's job-array replacement: TWO OS processes run
    ``cli.serve --multihost`` over one slide list; each writes its
    deterministic shard to {out}.part{i} and the union covers every
    slide exactly once."""
    import pandas as pd

    from sequoia_tpu.models import convert, vis
    from sequoia_tpu.train import checkpoint

    pytest.importorskip("sequoia_tpu.native")
    from sequoia_tpu import native
    from tests.test_pipeline_e2e import synthetic_wsi

    if not native.available():
        pytest.skip("native tiff reader unavailable")

    slide = synthetic_wsi()
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.tiff")
        native.write_tiled_tiff(p, [slide.levels[0], slide.levels[1]],
                                tile=(128, 128))
        paths.append(p)

    ckpt = tmp_path / "exp"
    ckpt.mkdir()
    cfg = vis.ViSConfig(num_outputs=3, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    checkpoint.save_torch_state_dict(
        convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(0))),
        str(ckpt / "model_best_0.pt"))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out_csv = str(tmp_path / "preds.csv")
    argv = ["--wsi", *paths, "--checkpoints", str(ckpt),
            "--weights", "random", "--batch_size", "16",
            "--compute_dtype", "float32", "--max_patches", "48",
            "--patch_size", "64", "--num_clusters", "8",
            "--gene_names", "A,B,C", "--out", out_csv,
            "--multihost", "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", "2"]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "serve_fleet_worker.py"),
             *argv, "--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"serve fleet worker failed:\n{out}"
    assert "rows [0:2) of 3" in outs[0], outs[0]
    assert "rows [2:3) of 3" in outs[1], outs[1]

    part0 = pd.read_csv(str(tmp_path / "preds.part0.csv"), index_col=0)
    part1 = pd.read_csv(str(tmp_path / "preds.part1.csv"), index_col=0)
    assert sorted(list(part0.index) + list(part1.index)) == \
        sorted(os.path.basename(p) for p in paths)
    assert len(part0) == 2 and len(part1) == 1
    for part in (part0, part1):
        assert list(part.columns) == ["A", "B", "C"]
        assert np.isfinite(part.to_numpy()).all()
