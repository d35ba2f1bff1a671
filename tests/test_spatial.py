"""Spatial sliding-window parity vs a direct reference-semantics oracle."""

import numpy as np
import pandas as pd

import jax

from sequoia_tpu.models import vis
from sequoia_tpu.pipeline import spatial


def reference_sliding_window(tile_feats, df, predict_one, inds, stride=1,
                             window=10, num_tokens=100):
    """Direct transcription of the reference algorithm semantics (per-window
    forward, per-tile lists, mean) over the same cached features."""
    preds = {g: {} for g in inds}
    max_x, max_y = df["xcoord_tf"].max(), df["ycoord_tf"].max()
    for x in range(0, max_x, stride):
        for y in range(0, max_y, stride):
            w = df[(df["xcoord_tf"] >= x) & (df["xcoord_tf"] < x + window)
                   & (df["ycoord_tf"] >= y) & (df["ycoord_tf"] < y + window)]
            if w.shape[0] > (window * window) / 2:
                feats = tile_feats[w.index.to_numpy()]
                pad = np.zeros((num_tokens - feats.shape[0], feats.shape[1]),
                               np.float32)
                feats = np.concatenate([feats, pad])
                p = predict_one(feats[None])[0]
                for key in w.index:
                    for g in inds:
                        preds[g].setdefault(key, []).append(p[g])
    return {g: {k: float(np.mean(v)) for k, v in d.items()}
            for g, d in preds.items()}


def make_grid_df(rng, nx=14, ny=14, keep=0.85, psr=64):
    pts = [(x * psr, y * psr) for x in range(nx) for y in range(ny)
           if rng.random() < keep]
    df = pd.DataFrame(pts, columns=["xcoord", "ycoord"])
    df["xcoord_tf"] = ((df.xcoord - df.xcoord.min()) / psr).astype(int)
    df["ycoord_tf"] = ((df.ycoord - df.ycoord.min()) / psr).astype(int)
    return df


def test_sliding_window_matches_reference_oracle():
    rng = np.random.default_rng(0)
    df = make_grid_df(rng)
    n = len(df)
    D, G = 16, 5
    tile_feats = rng.normal(size=(n, D)).astype(np.float32)

    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    predict_fn = spatial.make_vis_predict_fn(cfg, params)

    inds = [0, 3]
    got = spatial.sliding_window_predict(tile_feats, df, predict_fn, inds,
                                         stride=2, batch_windows=7)
    want = reference_sliding_window(tile_feats, df,
                                    lambda f: np.asarray(predict_fn(f)),
                                    inds, stride=2)
    assert set(got[0]) == set(want[0])
    for g in inds:
        for k in want[g]:
            assert abs(got[g][k] - want[g][k]) < 1e-4, (g, k)


def test_build_valid_tiles_and_run_visualize(tmp_path):
    from tests.test_pipeline_e2e import synthetic_wsi
    from sequoia_tpu.pipeline import patch_gen

    slide = synthetic_wsi()
    mask, _ = patch_gen.compute_slide_mask(slide)

    df = spatial.build_valid_tiles(mask, slide.dimensions, 64)
    assert len(df) > 30
    assert {"xcoord", "ycoord", "xcoord_tf", "ycoord_tf"} <= set(df.columns)

    # tiny extractor: mean-pool RGB tiles into a fixed feature dim
    def extractor(tiles_u8):
        t = tiles_u8.astype(np.float32) / 255.0
        pooled = t.reshape(t.shape[0], -1, 3).mean(axis=1)
        reps = np.tile(pooled, (1, 4))  # (n, 12)
        return reps.astype(np.float32)

    D, G = 12, 4
    gene_ids = [f"G{i}" for i in range(G)]
    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    fold_models = {f: spatial.make_vis_predict_fn(
        cfg, vis.init(cfg, jax.random.PRNGKey(f))) for f in range(2)}

    res = spatial.run_visualize(slide, mask, gene_ids, fold_models, extractor,
                                gene_names=["G1", "G2"], patch_size=64,
                                stride=2, save_path=str(tmp_path))
    assert "G1_0" in res.columns and "G1_1" in res.columns and "G1" in res.columns
    got_mean = res[["G1_0", "G1_1"]].mean(axis=1)
    pd.testing.assert_series_equal(res["G1"], got_mean, check_names=False)
    assert (tmp_path / "stride-2.csv").exists()
    # tiles covered by qualifying windows carry predictions
    assert res["G1"].notna().sum() > 10


def test_stacked_fold_predictor_matches_per_fold():
    rng = np.random.default_rng(2)
    df = make_grid_df(rng)
    D, G = 16, 5
    tile_feats = rng.normal(size=(len(df), D)).astype(np.float32)
    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    fold_params = {f: vis.init(cfg, jax.random.PRNGKey(f)) for f in range(3)}

    per_fold = {f: spatial.make_vis_predict_fn(cfg, p)
                for f, p in fold_params.items()}
    stacked = spatial.make_vis_stacked_predict_fn(cfg, fold_params)

    a = spatial.sliding_window_predict_multi(tile_feats, df, per_fold,
                                             [0, 2], stride=3)
    b = spatial.sliding_window_predict_multi(tile_feats, df, stacked,
                                             [0, 2], stride=3)
    assert set(a) == set(b) == {0, 1, 2}
    for f in a:
        for g in (0, 2):
            assert set(a[f][g]) == set(b[f][g])
            for k in a[f][g]:
                assert abs(a[f][g][k] - b[f][g][k]) < 1e-4


def test_zero_qualifying_windows_yield_nan_tables():
    """Sparse slide (no 10x10 window holds >50 tiles) must return all-NaN
    per-fold tables, not crash (dict path: KeyError on empty sums; stacked
    path: fold list discovered from the predictor's fold_keys attr)."""
    # 5 tiles: far below the >50-tiles-per-window rule
    df = pd.DataFrame({"xcoord": np.arange(5) * 10, "ycoord": np.zeros(5),
                       "xcoord_tf": np.arange(5), "ycoord_tf": np.zeros(5, int)})
    feats = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)

    fold_keys, means, seen = spatial.sliding_window_predict_arrays(
        feats, df, {0: lambda x: np.zeros((x.shape[0], 3)),
                    1: lambda x: np.zeros((x.shape[0], 3))},
        gene_indices=[0, 2], num_tokens=100)
    assert fold_keys == [0, 1] and not seen.any()
    for f in fold_keys:
        assert means[f].shape == (5, 2) and np.isnan(means[f]).all()

    cfg = vis.ViSConfig(num_outputs=3, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    stacked = spatial.make_vis_stacked_predict_fn(
        cfg, {0: vis.init(cfg, jax.random.PRNGKey(0)),
              1: vis.init(cfg, jax.random.PRNGKey(1))})
    fold_keys, means, _ = spatial.sliding_window_predict_arrays(
        feats, df, stacked, gene_indices=[1], num_tokens=100)
    assert fold_keys == [0, 1]
    assert all(np.isnan(means[f]).all() for f in fold_keys)

    # bare callable without fold_keys: empty result, no crash
    fold_keys, means, _ = spatial.sliding_window_predict_arrays(
        feats, df, lambda x: {0: np.zeros((x.shape[0], 3))},
        gene_indices=[0], num_tokens=100)
    assert fold_keys == [] and means == {}


def test_build_valid_tiles_counts_past_mask_tiles_like_reference():
    """Edge tiles whose mask crop is EMPTY (truncated downsample factor)
    count as valid — the reference's `sum() >= 0.5 * 0` is True there."""
    mask_xy = np.ones((10, 5), bool)  # x=10, y=5 -> downsample int(35/10)=3
    df = spatial.build_valid_tiles(mask_xy, (35, 35), patch_size_resized=7)
    # rows 15..28 map to rd>=5 (past the 5-row mask): empty crop -> valid
    assert ((df["ycoord"] >= 15).sum() > 0), df


def test_device_accumulate_matches_host():
    """accumulate='device' (one table upload, jitted gather/forward/
    scatter-add, f32 on-device sums) must match the host float64 path —
    subset and identity gene selections, stride 1 and 3, partial tail
    chunks (batch_windows=5)."""
    rng = np.random.default_rng(5)
    df = make_grid_df(rng, nx=16, ny=16, keep=0.9)
    D, G = 16, 7
    tile_feats = rng.normal(size=(len(df), D)).astype(np.float32)
    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    stacked = spatial.make_vis_stacked_predict_fn(
        cfg, {f: vis.init(cfg, jax.random.PRNGKey(f)) for f in range(2)})

    for inds in ([0, 2, 5], list(range(G))):
        for stride in (1, 3):
            kw = dict(stride=stride, batch_windows=5)
            fk_h, m_h, seen_h = spatial.sliding_window_predict_arrays(
                tile_feats, df, stacked, inds, accumulate="host", **kw)
            fk_d, m_d, seen_d = spatial.sliding_window_predict_arrays(
                tile_feats, df, stacked, inds, accumulate="device", **kw)
            assert fk_h == fk_d and (seen_h == seen_d).all()
            for f in fk_h:
                np.testing.assert_allclose(m_d[f], m_h[f],
                                           rtol=2e-5, atol=2e-6)


def test_device_accumulate_requires_stacked_predictor():
    import pytest

    df = make_grid_df(np.random.default_rng(1), nx=12, ny=12)
    feats = np.zeros((len(df), 4), np.float32)
    with pytest.raises(ValueError, match="stacked"):
        spatial.sliding_window_predict_arrays(
            feats, df, {0: lambda x: np.zeros((x.shape[0], 3))}, [0],
            accumulate="device")
    with pytest.raises(ValueError, match="auto|host|device"):
        spatial.sliding_window_predict_arrays(
            feats, df, {0: lambda x: np.zeros((x.shape[0], 3))}, [0],
            accumulate="gpu")


def test_mesh_sharded_spatial_matches_host():
    """The mesh-sharded window stage (windows over 'data', fold heads over
    'model', one-hot-GEMM overlap averaging) must match the host float64
    path — the production wiring of the layout the multichip dryrun's
    spatial leg certifies."""
    import jax

    from sequoia_tpu.parallel import sharding as sh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = sh.make_mesh(n_data=4, n_model=2)

    rng = np.random.default_rng(9)
    df = make_grid_df(rng, nx=16, ny=16, keep=0.9)
    D, G = 16, 8
    tile_feats = rng.normal(size=(len(df), D)).astype(np.float32)
    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    fold_params = {f: vis.init(cfg, jax.random.PRNGKey(f)) for f in range(2)}

    host_fn = spatial.make_vis_stacked_predict_fn(cfg, fold_params)
    mesh_fn = spatial.make_vis_stacked_predict_fn(cfg, fold_params,
                                                  mesh=mesh)

    for inds in ([1, 4], list(range(G))):
        kw = dict(stride=2, batch_windows=6)  # 6 rounds up to 8 (4-div)
        fk_h, m_h, seen_h = spatial.sliding_window_predict_arrays(
            tile_feats, df, host_fn, inds, accumulate="host", **kw)
        fk_d, m_d, seen_d = spatial.sliding_window_predict_arrays(
            tile_feats, df, mesh_fn, inds, mesh=mesh, **kw)
        assert fk_h == fk_d and (seen_h == seen_d).all()
        for f in fk_h:
            np.testing.assert_allclose(m_d[f], m_h[f], rtol=2e-5, atol=2e-6)

    # mesh requires the stacked predictor and device accumulation
    import pytest

    with pytest.raises(ValueError, match="stacked"):
        spatial.sliding_window_predict_arrays(
            tile_feats, df, {0: lambda x: np.zeros((x.shape[0], G))}, [0],
            mesh=mesh)
    with pytest.raises(ValueError, match="device"):
        spatial.sliding_window_predict_arrays(
            tile_feats, df, mesh_fn, [0], mesh=mesh, accumulate="host")
