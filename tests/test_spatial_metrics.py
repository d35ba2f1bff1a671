"""EMD / spatial-metric and GBM-module tests."""

import numpy as np
import pandas as pd

from sequoia_tpu.evaluation import gbm_modules, spatial_metrics as sm


def test_emd_basic_properties():
    a = np.zeros((5, 5))
    b = np.zeros((5, 5))
    assert sm.calculate_emd(a, b) == 0.0
    a[1, 1] = 1.0
    assert np.isnan(sm.calculate_emd(a, b))
    b[1, 1] = 1.0
    assert sm.calculate_emd(a, b) == 0.0
    # mass moved 3 cells right -> EMD == 3
    c = np.zeros((5, 5))
    c[1, 4] = 1.0
    assert abs(sm.calculate_emd(a, c) - 3.0) < 1e-5
    assert abs(sm.calculate_emd(a, c, norm=True) - 3.0 / 5) < 1e-5


def test_get_average_and_median_filter():
    gt = pd.DataFrame({"x": [0, 1, 10], "y": [0, 0, 0],
                       "gene_expr": [1.0, 3.0, 100.0]})
    assert sm.get_average(0, 0, gt, num_tiles=2) == 2.0

    df = pd.DataFrame({"xcoord_tf": [0, 1, 2, 0, 1, 2, 0, 1, 2],
                       "ycoord_tf": [0, 0, 0, 1, 1, 1, 2, 2, 2],
                       "v": [9.0, 1, 2, 3, 4, 5, 6, 7, 8]})
    # full 3x3 window at center: median of all 9
    assert sm.median_filter(df, "v", 1, 1, 1) == 5.0
    # corner window has 4 tiles <= 4.5 -> falls back to the tile's own value
    assert sm.median_filter(df, "v", 0, 0, 1) == 9.0


def test_emd_for_gene_end_to_end():
    rng = np.random.default_rng(0)
    tiles = [(x, y) for x in range(6) for y in range(6)]
    pred = pd.DataFrame(tiles, columns=["xcoord_tf", "ycoord_tf"])
    pred["xcoord"] = pred["xcoord_tf"] * 64
    pred["ycoord"] = pred["ycoord_tf"] * 64
    pred["GENE"] = rng.random(len(pred))
    gt = pd.DataFrame({
        "x": pred["xcoord"] + rng.integers(-8, 8, len(pred)),
        "y": pred["ycoord"] + rng.integers(-8, 8, len(pred)),
        "gene_expr": pred["GENE"] + 0.05 * rng.standard_normal(len(pred)),
    })
    out = sm.emd_for_gene(pred, gt, "GENE")
    assert set(out) == {"emd", "nr_gt_vals", "emd_filt", "nr_gt_vals_filt"}
    assert np.isfinite(out["emd"]) and out["emd"] >= 0
    # identical maps with 1-nearest ground truth -> EMD ~ 0
    gt_same = pd.DataFrame({"x": pred["xcoord"], "y": pred["ycoord"],
                            "gene_expr": pred["GENE"]})
    out2 = sm.emd_for_gene(pred, gt_same, "GENE", num_tiles=1)
    assert out2["emd"] < 1e-5


def test_gbm_module_assignment():
    rng = np.random.default_rng(1)
    n = 50
    df = pd.DataFrame({"xcoord_tf": np.arange(n) % 10,
                       "ycoord_tf": np.arange(n) // 10})
    # module A genes high on the first half, module B on the second
    half = np.r_[np.ones(25), np.zeros(25)]
    df["a1"] = half * 10 + rng.random(n)
    df["a2"] = half * 8 + rng.random(n)
    df["b1"] = (1 - half) * 9 + rng.random(n)
    modules = {"A": ["a1", "a2", "missing_gene"], "B": ["b1"]}

    present = gbm_modules.module_gene_columns(df, modules)
    assert present == {"A": ["a1", "a2"], "B": ["b1"]}

    corr = gbm_modules.correlation_matrix(df, modules)
    assert list(corr.columns) == ["a1", "a2", "b1"]
    assert corr.loc["a1", "a2"] > 0.9 and corr.loc["a1", "b1"] < -0.9

    assign = gbm_modules.assign_modules(df, modules)
    assert (assign[:25] == "A").all() and (assign[25:] == "B").all()


def test_cli_get_emd_with_csv_ground_truth(tmp_path):
    from sequoia_tpu.cli import get_emd as cli_emd

    rng = np.random.default_rng(3)
    tiles = [(x, y) for x in range(6) for y in range(6)]
    pred = pd.DataFrame(tiles, columns=["xcoord_tf", "ycoord_tf"])
    pred["xcoord"] = pred["xcoord_tf"] * 64
    pred["ycoord"] = pred["ycoord_tf"] * 64
    pred["GENEA"] = rng.random(len(pred))
    pred["GENEB"] = rng.random(len(pred))
    pred_csv = tmp_path / "stride-1.csv"
    pred.to_csv(pred_csv, index=False)

    for g in ("GENEA", "GENEB"):
        gt = pd.DataFrame({"x": pred["xcoord"], "y": pred["ycoord"],
                           "gene_expr": pred[g] + 0.01 * rng.standard_normal(len(pred))})
        gt.to_csv(tmp_path / f"gt_{g}.csv", index=False)

    cli_emd.main(["--pred_csv", str(pred_csv), "--gene_names", "GENEA,GENEB",
                  "--save_folder", str(tmp_path / "out"),
                  "--gt_csv_template", str(tmp_path / "gt_{gene}.csv")])
    out = pd.read_csv(tmp_path / "out" / "metrics.csv")
    assert set(out["gene"]) == {"GENEA", "GENEB"}
    assert {"emd", "emd_filt", "nr_gt_vals", "nr_gt_vals_filt"} <= set(out.columns)
    assert np.isfinite(out["emd"]).all()


def test_cli_get_emd_reference_layout(tmp_path):
    """--slide_nr/--pred_folder reconstruct the reference's GBM path scheme
    (reference get_emd.py:100-122)."""
    from sequoia_tpu.cli import get_emd as cli_emd

    rng = np.random.default_rng(5)
    tiles = [(x, y) for x in range(5) for y in range(5)]
    pred = pd.DataFrame(tiles, columns=["xcoord_tf", "ycoord_tf"])
    pred["xcoord"] = pred["xcoord_tf"] * 64
    pred["ycoord"] = pred["ycoord_tf"] * 64
    pred["GENEA"] = rng.random(len(pred))
    pdir = tmp_path / "visualizations" / "spatial_GBM_pred" / "run1" / "HRI_7_T.tif"
    pdir.mkdir(parents=True)
    pred.to_csv(pdir / "stride-1.csv", index=False)
    gt = pd.DataFrame({"x": pred["xcoord"], "y": pred["ycoord"],
                       "gene_expr": pred["GENEA"]})
    gt.to_csv(tmp_path / "gt_GENEA.csv", index=False)

    cli_emd.main(["--slide_nr", "7", "--pred_folder", "run1",
                  "--data_root", str(tmp_path),
                  "--gene_names", "GENEA", "--save_folder", "cmp",
                  "--gt_csv_template", str(tmp_path / "gt_{gene}.csv")])
    out = pd.read_csv(tmp_path / "visualizations" / "comparisons" / "cmp"
                      / "HRI_7_T.tif" / "metrics.csv")
    assert set(out["gene"]) == {"GENEA"} and np.isfinite(out["emd"]).all()


def test_cli_gbm_analysis(tmp_path):
    from sequoia_tpu.cli import gbm_analysis as cli_gbm

    rng = np.random.default_rng(4)
    n = 60
    df = pd.DataFrame({"xcoord_tf": np.arange(n) % 10,
                       "ycoord_tf": np.arange(n) // 10})
    half = np.r_[np.ones(30), np.zeros(30)]
    df["g1"] = half * 5 + rng.random(n)
    df["g2"] = half * 4 + rng.random(n)
    df["g3"] = (1 - half) * 5 + rng.random(n)
    csv = tmp_path / "slideX" / "stride-1.csv"
    csv.parent.mkdir()
    df.to_csv(csv, index=False)

    mod_dir = tmp_path / "modules"
    mod_dir.mkdir()
    np.save(mod_dir / "AC.npy", np.asarray(["g1", "g2"], dtype=object))
    np.save(mod_dir / "MES1.npy", np.asarray(["g3"], dtype=object))

    cli_gbm.main(["--pred_csv", str(csv), "--module_dir", str(mod_dir),
                  "--save_folder", str(tmp_path / "out"), "--merged", "0"])
    assert (tmp_path / "out" / "slideX_corr.csv").exists()
    assert (tmp_path / "out" / "slideX_clustermap.png").exists()
    assert (tmp_path / "out" / "slideX_spatial.png").exists()
    mods = pd.read_csv(tmp_path / "out" / "slideX_modules.csv", index_col=0)
    assert set(mods.iloc[:, 0].unique()) == {"AC", "MES1"}

    # merged categories (the reference coloring): AC -> ac, MES1 -> mes
    cli_gbm.main(["--pred_csv", str(csv), "--module_dir", str(mod_dir),
                  "--save_folder", str(tmp_path / "out2")])
    mods2 = pd.read_csv(tmp_path / "out2" / "slideX_modules.csv", index_col=0)
    assert set(mods2.iloc[:, 0].unique()) == {"ac", "mes"}


def test_merge_categories_and_average_corr():
    mods = {"AC": ["a"], "G1S": ["b"], "G2M": ["c"], "MES1": ["d"],
            "MES2": [], "NPC1": ["e"], "NPC2": [], "OPC": ["f"]}
    merged = gbm_modules.merge_categories(mods)
    assert merged == {"ac": ["a"], "cc": ["b", "c"], "mes": ["d"],
                      "lin": ["e", "f"]}

    c1 = pd.DataFrame([[1.0, 0.0], [0.0, 1.0]], columns=["a", "b"],
                      index=["a", "b"])
    c2 = pd.DataFrame([[1.0, 1.0], [1.0, 1.0]], columns=["a", "b"],
                      index=["a", "b"])
    avg = gbm_modules.average_correlation([c1, c2])
    np.testing.assert_allclose(avg.values, [[1.0, 0.5], [0.5, 1.0]])


def test_percentile_scores_mean_then_percentile():
    from scipy.stats import percentileofscore

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g1": rng.random(20), "g2": rng.random(20)})
    scores = gbm_modules.percentile_scores(df, {"M": ["g1", "g2"]})
    means = df[["g1", "g2"]].mean(axis=1).to_numpy()
    want = [percentileofscore(means, v) for v in means]
    np.testing.assert_allclose(scores["M"].to_numpy(), want)


def test_gbm_modules_nan_tiles_dropped_like_reference():
    """A NaN tile (routine stride-1.csv border row) must not poison the
    module scores (reference dropna, gbm_celltype_analysis.py:72/97):
    scores on clean tiles stay finite, NaN tiles get NaN assignments, and
    correlations use listwise deletion."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.normal(size=(20, 4)), columns=["A1", "A2", "B1", "B2"])
    df.loc[3, "A1"] = np.nan  # one bad tile
    modules = {"ac": ["A1", "A2"], "mes": ["B1", "B2"]}

    scores = gbm_modules.percentile_scores(df, modules)
    clean = scores.drop(index=3)
    assert np.isfinite(clean.to_numpy()).all()
    assert scores.loc[3].isna().all()

    assign = gbm_modules.assign_modules(df, modules)
    assert pd.isna(assign.loc[3]) and assign.drop(index=3).notna().all()

    corr = gbm_modules.correlation_matrix(df, modules)
    want = df.drop(index=3)[["A1", "A2", "B1", "B2"]].corr()
    np.testing.assert_allclose(corr.to_numpy(), want.to_numpy())
