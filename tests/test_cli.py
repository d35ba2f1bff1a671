"""CLI smoke tests: the reference-compatible flag surfaces drive the stages."""

import pytest
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


def test_cli_main_bf16_fast_path(tmp_path, monkeypatch):
    # --compute_dtype bfloat16 (bf16 blocks + host-side bf16 batch casts)
    # and --moment_dtype bfloat16 (low-memory AdamW) train end-to-end and
    # still emit the reference artifacts (torch-loadable f32 state dict)
    import torch

    from sequoia_tpu.cli import main as cli_main

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=10, n_genes=4, dim=8)
    ref = tmp_path / "ref_file.csv"
    df.to_csv(ref, index=False)

    monkeypatch.chdir(tmp_path)
    cli_main.main([
        "--ref_file", str(ref), "--feature_path", str(store),
        "--model_type", "vis", "--depth", "1", "--num-heads", "2",
        "--k", "2", "--batch_size", "4", "--num_epochs", "2", "--train",
        "--compute_dtype", "bfloat16", "--moment_dtype", "bfloat16",
        "--exp_name", "bf16"])
    out = tmp_path / "saved_exp" / "TCGA" / "bf16"
    assert (out / "test_results.pkl").exists()
    sd = torch.load(out / "model_best_0.pt", weights_only=True)
    assert all(v.dtype == torch.float32 for v in sd.values())


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_download_rnaseq_filter_logic(monkeypatch):
    """GDC downloader's gene-type + median-FPKM-UQ filters (network mocked)."""
    import pandas as pd
    from sequoia_tpu.cli import download_rnaseq as dl

    hits = [{"file_id": f"f{i}",
             "cases": [{"samples": [{"submitter_id": f"S{i}"}]}]}
            for i in range(3)]
    monkeypatch.setattr(dl, "list_star_counts_files", lambda p, **k: hits)

    genes = pd.DataFrame({
        "gene_name": ["OK1", "OK2", "RIBO", "ZERO"],
        "gene_type": ["protein_coding", "miRNA", "rRNA", "lncRNA"],
    })

    def fake_fetch(file_id):
        i = int(file_id[1:])
        df = genes.copy()
        df["fpkm_uq_unstranded"] = [10.0 + i, 5.0, 99.0, 0.0]
        return df

    monkeypatch.setattr(dl, "fetch_star_counts", fake_fetch)

    import tempfile
    with tempfile.TemporaryDirectory() as out:
        path = dl.build_expression_table("TCGA-TEST", out)
        table = pd.read_csv(path, index_col=0)
    # rRNA dropped (gene type), ZERO dropped (median FPKM-UQ == 0)
    assert set(table.index) == {"OK1", "OK2"}
    assert list(table.columns) == ["S0", "S1", "S2"]
    assert table.loc["OK1", "S2"] == 12.0


def test_cli_main_project_filter_and_sampling(tmp_path, monkeypatch):
    from sequoia_tpu.cli import main as cli_main

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=12, n_genes=3, dim=8)
    df.loc[:3, "tcga_project"] = "TCGA-OTHER"  # rows 0-3 filtered out
    # move their h5 files so filter_no_features also drops them if kept
    ref = tmp_path / "ref.csv"
    df.to_csv(ref, index=False)

    monkeypatch.chdir(tmp_path)
    cli_main.main([
        "--ref_file", str(ref), "--feature_path", str(store),
        "--tcga_projects", "TCGA-TEST",
        "--model_type", "vis", "--depth", "1", "--num-heads", "2",
        "--k", "2", "--batch_size", "4", "--num_epochs", "1", "--train",
        "--exp_name", "filt"])
    import pickle
    with open(tmp_path / "saved_exp" / "TCGA" / "filt" / "test_results.pkl",
              "rb") as f:
        out = pickle.load(f)
    n = sum(out[f"split_{i}"]["preds"].shape[0] for i in range(2))
    assert n == 8  # 12 slides minus the 4 filtered by project
    assert all(p == "TCGA-TEST"
               for i in range(2) for p in out[f"split_{i}"]["tcga_project"])


def test_cv_hf_export_rejects_vit(tmp_path):
    """hf_export with model_type='vit' errors (no hub mixin in the
    reference's ViT) instead of silently exporting nothing."""
    from sequoia_tpu.train import cv

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=8, n_genes=3, dim=8)
    with pytest.raises(ValueError, match="hf_export"):
        cv.run_cross_validation(
            df, str(store), str(tmp_path / "exp"), model_type="vit",
            k=2, batch_size=4, num_epochs=1, verbose=False, hf_export=True)


def test_he2rna_cv_hf_export(tmp_path):
    """HE2RNA CV hf_export writes loadable per-fold layout dirs."""
    from sequoia_tpu.models import convert
    from sequoia_tpu.train import checkpoint, cv

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=8, n_genes=3, dim=8)
    cv.run_he2rna_cross_validation(
        df, str(store), str(tmp_path / "exp"), k=2, batch_size=4,
        max_epochs=1, verbose=False, hf_export=True)
    for i in range(2):
        d = tmp_path / "exp" / f"hf_fold_{i}"
        sd = checkpoint.load_hf_vis_state_dict(str(d))
        cfg, params = convert.he2rna_from_torch(sd)
        assert cfg.output_dim == 3


def test_cv_hf_export_fold_dirs(tmp_path):
    """hf_export=True writes per-fold PyTorchModelHubMixin dirs our loader
    (and the reference's from_pretrained) can open — holding the BEST-val
    weights (== model_best_{i}.pt), exactly like the released checkpoints,
    even though eval_on='final' evaluates the final-epoch weights."""
    import numpy as np

    from sequoia_tpu.models import convert
    from sequoia_tpu.train import checkpoint, cv

    store = tmp_path / "features"
    df = make_store(str(store), n_slides=8, n_genes=3, dim=8)
    out = cv.run_cross_validation(
        df, str(store), str(tmp_path / "exp"), model_type="vis",
        k=2, batch_size=4, num_epochs=3, verbose=False, hf_export=True)
    assert "split_1" in out
    for i in range(2):
        d = tmp_path / "exp" / f"hf_fold_{i}"
        assert (d / "config.json").exists()
        sd = checkpoint.load_hf_vis_state_dict(str(d))
        cfg, params = convert.vis_from_torch(sd)
        assert cfg.num_outputs == 3
        best_sd = checkpoint.load_torch_checkpoint(
            str(tmp_path / "exp" / f"model_best_{i}.pt"))
        _, best_params = convert.vis_from_torch(best_sd, cfg)
        np.testing.assert_array_equal(np.asarray(params["head_w"]),
                                      np.asarray(best_params["head_w"]))


def test_cli_kmeans_gtex_mode(tmp_path):
    """GTEx mode (reference kmean_features.py:27-30,67-71): features live
    under {feature_path}/{gtex_tissue}/{wsi}/ with the full wsi name (no
    .svs strip), selected by --gtex/--gtex_tissue."""
    import numpy as np

    from sequoia_tpu.cli import kmean_features as kf

    rng = np.random.default_rng(0)
    wsi = "GTEX-1117F-0126"  # GTEx ids carry no .svs suffix
    d = tmp_path / "features" / "Lung" / wsi
    d.mkdir(parents=True)
    with h5py.File(d / f"{wsi}.h5", "w") as f:
        f.create_dataset("resnet_features",
                         data=rng.normal(size=(40, 16)).astype(np.float32))
    ref = tmp_path / "ref.csv"
    pd.DataFrame([{"wsi_file_name": wsi, "patient_id": "GTEX-1117F",
                   "rna_A": 0.1}]).to_csv(ref, index=False)

    kf.main(["--ref_file", str(ref), "--feature_path", str(tmp_path / "features"),
             "--num_clusters", "8", "--backend", "tpu",
             "--gtex", "--gtex_tissue", "Lung"])
    with h5py.File(d / f"{wsi}.h5", "r") as f:
        assert f["cluster_features"].shape == (8, 16)


def test_all_cli_parsers_build():
    """Every CLI module imports and its parser builds + prints help text
    (catches import rot and argparse conflicts across the whole surface)."""
    import importlib

    mods = ["patch_gen", "compute_features", "kmean_features", "main",
            "pretrain_gtex", "he2rna", "evaluate_model",
            "predict_independent", "visualize", "get_emd", "gbm_analysis",
            "download_rnaseq", "serve"]
    for name in mods:
        m = importlib.import_module(f"sequoia_tpu.cli.{name}")
        p = m.build_parser()
        assert p.format_help()
