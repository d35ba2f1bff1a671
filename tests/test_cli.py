"""CLI smoke tests: the reference-compatible flag surfaces drive the stages."""

import os

import h5py
import numpy as np
import pandas as pd

from tests.test_data_and_train import make_store
from tests.test_pipeline_e2e import synthetic_wsi


def test_cli_main_trains(tmp_path, monkeypatch):
    from sequoia_tpu.cli import main as cli_main

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=10, n_genes=4, dim=8)
    ref = tmp_path / "ref_file.csv"
    df.to_csv(ref, index=False)

    monkeypatch.chdir(tmp_path)
    cli_main.main([
        "--ref_file", str(ref), "--feature_path", str(store),
        "--model_type", "vis", "--depth", "1", "--num-heads", "2",
        "--k", "2", "--batch_size", "4", "--num_epochs", "1", "--train",
        "--exp_name", "smoke"])
    out = tmp_path / "saved_exp" / "TCGA" / "smoke"
    assert (out / "test_results.pkl").exists()
    assert (out / "model_best_0.pt").exists()


def test_cli_feature_and_kmeans_pipeline(tmp_path, monkeypatch):
    from sequoia_tpu.cli import compute_features as cf
    from sequoia_tpu.cli import kmean_features as kf
    from sequoia_tpu.pipeline import patch_gen

    # tile a synthetic slide first
    patch_dir = tmp_path / "patches"
    patch_gen.extract_patches(synthetic_wsi(), str(patch_dir), str(patch_dir),
                              "S1", (64, 64), max_patches_per_slide=40,
                              verbose=False)
    ref = tmp_path / "ref.csv"
    pd.DataFrame([{"wsi_file_name": "S1.svs", "patient_id": "P0",
                   "tcga_project": "TCGA-SYN", "rna_A": 0.5}]).to_csv(ref, index=False)

    feat_dir = tmp_path / "features"
    cf.main(["--feat_type", "resnet", "--ref_file", str(ref),
             "--patch_data_path", str(patch_dir), "--feature_path", str(feat_dir),
             "--weights", "random", "--batch_size", "16",
             "--max_patch_number", "32"])
    h5 = feat_dir / "TCGA-SYN" / "S1" / "S1.h5"
    with h5py.File(h5, "r") as f:
        assert f["resnet_features"].shape == (32, 2048)

    kf.main(["--ref_file", str(ref), "--feature_path", str(feat_dir),
             "--num_clusters", "8", "--backend", "tpu"])
    with h5py.File(h5, "r") as f:
        assert f["cluster_features"].shape == (8, 2048)


def test_cli_evaluate_model(tmp_path):
    from sequoia_tpu.cli import evaluate_model as cem
    import pickle

    rng = np.random.default_rng(0)
    n, G = 30, 6
    genes = [f"G{i}" for i in range(G)]
    real = rng.normal(size=(n, G)).astype(np.float32)
    res = {"genes": genes}
    for k, sl in enumerate(np.array_split(np.arange(n), 2)):
        res[f"split_{k}"] = {"real": real[sl],
                             "preds": real[sl] + 0.1 * rng.normal(size=(len(sl), G)).astype(np.float32),
                             "random": rng.normal(size=(len(sl), G)).astype(np.float32),
                             "wsi_file_name": [f"w{i}" for i in sl],
                             "tcga_project": ["TCGA-X"] * len(sl)}
    os.makedirs(tmp_path / "brca")
    with open(tmp_path / "brca" / "test_results.pkl", "wb") as f:
        pickle.dump(res, f)

    cem.main(["--model_dir", str(tmp_path), "--cancers", "brca",
              "--folds", "2"])
    assert (tmp_path / "results" / "all_genes.csv").exists()
    sig = pd.read_csv(tmp_path / "results" / "sig_genes.csv", index_col=0)
    assert len(sig) == G  # perfectly-correlated predictions are significant


def test_cli_pretrain_gtex_quick(tmp_path, monkeypatch):
    from sequoia_tpu.cli import pretrain_gtex as pg

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=8, n_genes=4, dim=8)
    ref = tmp_path / "gtex_ref.csv"
    df.to_csv(ref, index=False)

    monkeypatch.chdir(tmp_path)
    pg.main(["--path_csv", str(ref), "--feature_path", str(store),
             "--model", "vis", "--num_epochs", "2", "--batch_size", "4",
             "--save_dir", str(tmp_path / "pre"), "--exp_name", "q",
             "--quick", "0"])
    # date-stamped experiment dir with a torch checkpoint inside
    exp_dirs = list((tmp_path / "pre").iterdir())
    assert len(exp_dirs) == 1 and exp_dirs[0].name.endswith("_q")
    assert (exp_dirs[0] / "model_best.pt").exists()

    # the checkpoint round-trips through the fine-tune head-swap path
    # (same architecture flags as pretraining, like the reference requires)
    from sequoia_tpu.train import cv
    out = cv.run_cross_validation(
        df, str(store), str(tmp_path / "ft"), model_type="vis",
        k=2, batch_size=4, num_epochs=1, verbose=False,
        checkpoint_path=str(exp_dirs[0] / "model_best.pt"),
        change_num_genes=4)
    assert "split_0" in out


def test_cli_pretrain_gtex_he2rna(tmp_path, monkeypatch):
    from sequoia_tpu.cli import pretrain_gtex as pg

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=6, n_genes=3, dim=8)
    ref = tmp_path / "gtex_ref.csv"
    df.to_csv(ref, index=False)
    monkeypatch.chdir(tmp_path)
    pg.main(["--path_csv", str(ref), "--feature_path", str(store),
             "--model", "he2rna", "--num_epochs", "1", "--batch_size", "4",
             "--save_dir", str(tmp_path / "pre"), "--exp_name", "h"])
    exp_dirs = list((tmp_path / "pre").iterdir())
    assert (exp_dirs[0] / "model.pt").exists()
