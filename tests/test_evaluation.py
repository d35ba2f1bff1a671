"""Evaluation-stack tests: stats primitives, per-gene tables, CV end-to-end."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest
from scipy import stats as sstats

import jax

from sequoia_tpu.evaluation import correlation_stats as cs
from sequoia_tpu.evaluation import evaluate_model as em
from sequoia_tpu.evaluation.predict_independent import predict_independent
from sequoia_tpu.models import convert, vis
from sequoia_tpu.train import checkpoint, cv
from tests.test_data_and_train import make_store


def test_fdr_bh_matches_definition():
    rng = np.random.default_rng(0)
    p = rng.uniform(size=57)
    got = em.fdr_bh(p)
    # independent reference implementation
    n = len(p)
    order = np.argsort(p)
    adj = np.empty(n)
    prev = 1.0
    for rank_from_top in range(n, 0, -1):
        i = order[rank_from_top - 1]
        val = min(prev, p[i] * n / rank_from_top)
        adj[i] = val
        prev = val
    np.testing.assert_allclose(got, adj, rtol=1e-12)


def test_pearson_with_p_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(30, 6))
    y = rng.normal(size=(30, 6))
    y[:, 0] = x[:, 0] * 2 + rng.normal(size=30) * 0.1
    r, p = em.pearson_with_p(x, y)
    for g in range(6):
        rr, pp = sstats.pearsonr(x[:, g], y[:, g])
        assert abs(r[g] - rr) < 1e-10
        assert abs(p[g] - pp) < 1e-8


def test_dependent_corr_formula():
    # scalar spot check against the published Steiger example-style formula
    xy, xz, yz, n = 0.63, 0.31, 0.42, 103
    t, p = cs.dependent_corr(xy, xz, yz, n, twotailed=False, method="steiger")
    d = xy - xz
    det = 1 - xy**2 - xz**2 - yz**2 + 2 * xy * xz * yz
    av = (xy + xz) / 2
    cube = (1 - yz) ** 3
    t_ref = d * np.sqrt((n - 1) * (1 + yz) /
                        ((2 * (n - 1) / (n - 3)) * det + av**2 * cube))
    assert abs(float(t) - t_ref) < 1e-12
    assert abs(float(p) - (1 - sstats.t.cdf(abs(t_ref), n - 3))) < 1e-12
    lo, hi = cs.dependent_corr(xy, xz, yz, n, method="zou")
    assert lo < xy - xz < hi


def test_independent_corr_fisher():
    z, p = cs.independent_corr(0.5, 0.6, 103, 103, twotailed=True, method="fisher")
    zr = abs(np.arctanh(0.5) - np.arctanh(0.6)) / np.sqrt(2 / 100)
    assert abs(float(z) - zr) < 1e-12
    assert 0 < float(p) < 1


def test_evaluate_split_results_sig_filter():
    rng = np.random.default_rng(2)
    n, G = 60, 10
    real = rng.normal(size=(n, G)).astype(np.float32)
    pred = rng.normal(size=(n, G)).astype(np.float32)
    rand = rng.normal(size=(n, G)).astype(np.float32)
    # genes 0..3 strongly predicted
    pred[:, :4] = real[:, :4] + 0.2 * rng.normal(size=(n, 4))
    genes = [f"G{i}" for i in range(G)]
    test_res = {"genes": genes}
    # split into 3 folds
    for k, sl in enumerate(np.array_split(np.arange(n), 3)):
        test_res[f"split_{k}"] = {
            "real": real[sl], "preds": pred[sl], "random": rand[sl],
            "wsi_file_name": [f"w{i}" for i in sl],
            "tcga_project": ["TCGA-X"] * len(sl)}
    res = em.evaluate_split_results(test_res)
    assert set(res.columns) >= {"pred_real_r", "random_real_r", "pearson_p",
                                "Steiger_p", "rmse_pred", "rmse_random",
                                "rmse_quantile_norm", "rmse_mean_norm",
                                "fdr_pearson_p", "fdr_Steiger_p"}
    sig = em.significant_genes(res)
    assert set(sig.index) == {"G0", "G1", "G2", "G3"}
    # sorted by pred_real_r descending
    assert list(res["pred_real_r"]) == sorted(res["pred_real_r"], reverse=True)


def test_cv_end_to_end(tmp_path):
    store = tmp_path / "features"
    save = tmp_path / "exp"
    df = make_store(str(store), n_slides=18, n_genes=5, dim=8)
    out = cv.run_cross_validation(
        df, str(store), str(save), model_type="vis", depth=1, num_heads=2,
        k=3, batch_size=4, num_epochs=2, verbose=False)

    assert set(out) == {"split_0", "split_1", "split_2", "genes"}
    assert out["genes"] == [f"G{i}" for i in range(5)]
    total = sum(out[f"split_{i}"]["preds"].shape[0] for i in range(3))
    assert total == 18
    for i in range(3):
        s = out[f"split_{i}"]
        assert s["preds"].shape == s["real"].shape == s["random"].shape
        assert not np.allclose(s["preds"], s["random"])

    # pickle written and readable; checkpoints load into torch-format dicts
    with open(save / "test_results.pkl", "rb") as f:
        loaded = pickle.load(f)
    assert loaded["genes"] == out["genes"]
    sd = checkpoint.load_torch_checkpoint(str(save / "model_best_0.pt"))
    cfg2, params2 = convert.vis_from_torch(sd)
    assert cfg2.num_outputs == 5 and cfg2.input_dim == 8

    # the evaluation layer consumes the CV output directly
    res = em.evaluate_split_results(out)
    assert len(res) == 5


def test_predict_independent_local_ckpts(tmp_path):
    store = tmp_path / "features"
    df = make_store(str(store), n_slides=6, n_genes=4, dim=8)
    # write 2 fold checkpoints
    cfg = vis.ViSConfig(num_outputs=4, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4)
    for fold in range(2):
        params = vis.init(cfg, jax.random.PRNGKey(fold))
        checkpoint.save_torch_state_dict(
            convert.vis_to_torch(cfg, params),
            str(tmp_path / f"ckpt_{fold}.pt"))
    out = predict_independent(
        df, str(store), str(tmp_path / "res"),
        checkpoint_template=str(tmp_path / "ckpt_{fold}.pt"),
        folds=2, depth=1, num_heads=2, verbose=False)
    assert out["pred"].shape == (6, 4)
    assert list(out["pred"].columns) == [f"G{i}" for i in range(4)]
    assert (tmp_path / "res" / "test_results.pkl").exists()


def test_he2rna_cv_end_to_end(tmp_path):
    store = tmp_path / "features"
    save = tmp_path / "exp"
    df = make_store(str(store), n_slides=12, n_genes=3, dim=8)
    out = cv.run_he2rna_cross_validation(
        df, str(store), str(save), k=2, batch_size=4, max_epochs=2,
        verbose=False)
    assert set(out) == {"split_0", "split_1", "genes"}
    for i in range(2):
        assert (out[f"split_{i}"]["preds"] >= 0).all()
    assert os.path.exists(save / "model_0.pt")


def test_cv_vit_variant(tmp_path):
    store = tmp_path / "features"
    df = make_store(str(store), n_slides=12, n_genes=4, dim=16)
    out = cv.run_cross_validation(
        df, str(store), str(tmp_path / "exp"), model_type="vit", depth=1,
        num_heads=2, k=2, batch_size=4, num_epochs=1, verbose=False,
        resume=True)
    assert set(out) == {"split_0", "split_1", "genes"}
    assert (tmp_path / "exp" / "train_state_0.npz").exists()
    sd = checkpoint.load_torch_checkpoint(str(tmp_path / "exp" / "model_best_0.pt"))
    assert "transformer.layers.0.0.to_qkv.weight" in sd


def test_predict_independent_non_contract_tokens(tmp_path):
    """Checkpoints trained at 8 cluster tokens (not the contract's 100):
    the significance-null model must mirror the loaded ensemble's
    num_clusters (round-5 fix — it was hard-coded to 100)."""
    store = tmp_path / "features"
    df = make_store(str(store), n_slides=6, n_genes=4, dim=8, tokens=8)
    cfg = vis.ViSConfig(num_outputs=4, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    for fold in range(2):
        params = vis.init(cfg, jax.random.PRNGKey(fold))
        checkpoint.save_torch_state_dict(
            convert.vis_to_torch(cfg, params),
            str(tmp_path / f"ckpt_{fold}.pt"))
    out = predict_independent(
        df, str(store), str(tmp_path / "res"),
        checkpoint_template=str(tmp_path / "ckpt_{fold}.pt"),
        folds=2, depth=1, num_heads=2, verbose=False)
    assert out["pred"].shape == (6, 4)
    assert out["random"].shape == (6, 4)
    assert np.isfinite(out["random"].to_numpy()).all()


def test_he2rna_cv_non_contract_tokens(tmp_path):
    """An 8-token store filters the reference k sweep to k <= T (round-5
    fix — lax.top_k, like torch.topk, rejects k > T)."""
    store = tmp_path / "features"
    df = make_store(str(store), n_slides=8, n_genes=3, dim=8, tokens=8)
    out = cv.run_he2rna_cross_validation(
        df, str(store), str(tmp_path / "exp"), k=2, batch_size=4,
        max_epochs=1, verbose=False)
    assert set(out) == {"split_0", "split_1", "genes"}
    assert os.path.exists(tmp_path / "exp" / "model_0.pt")
    for i in range(2):
        assert np.isfinite(out[f"split_{i}"]["preds"]).all()
