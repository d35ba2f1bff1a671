"""TPU k-means quality/behavior tests vs sklearn."""

import numpy as np
import pytest
from sklearn.cluster import KMeans

import jax
import jax.numpy as jnp

from sequoia_tpu.ops import kmeans as km


def blobs(n=400, d=16, k=8, seed=0, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 2
    labels = rng.integers(0, k, size=n)
    x = centers[labels] + spread * rng.normal(size=(n, d))
    return x.astype(np.float32)


def sk_inertia(x, k, seed=0):
    m = KMeans(n_clusters=k, random_state=seed).fit(x)
    return m.inertia_, m


def test_kmeans_matches_sklearn_quality():
    x = blobs()
    ref_inertia, _ = sk_inertia(x, 8)
    mask = jnp.ones((x.shape[0],), bool)
    _, labels, inertia, n_iter = km.kmeans_fit(jnp.asarray(x), mask,
                                               jax.random.PRNGKey(0),
                                               n_clusters=8)
    # well-separated blobs: both must find the optimal clustering
    assert float(inertia) <= ref_inertia * 1.01
    assert int(n_iter) < 20


def test_kmeans_masked_rows_inert():
    x = blobs(n=256)
    pad = np.zeros((64, x.shape[1]), np.float32)
    xp = jnp.asarray(np.concatenate([x, pad]))
    mask = jnp.asarray(np.r_[np.ones(256, bool), np.zeros(64, bool)])
    c1, l1, i1, _ = km.kmeans_fit(xp, mask, jax.random.PRNGKey(1), n_clusters=8)
    c2, l2, i2, _ = km.kmeans_fit(jnp.asarray(x), jnp.ones((256,), bool),
                                  jax.random.PRNGKey(1), n_clusters=8)
    assert abs(float(i1) - float(i2)) / float(i2) < 1e-4
    m1 = np.asarray(km.cluster_means(xp, l1, mask, 8))
    m2 = np.asarray(km.cluster_means(jnp.asarray(x), l2,
                                     jnp.ones((256,), bool), 8))
    # same clustering up to label permutation: compare sorted rows
    np.testing.assert_allclose(np.sort(m1, axis=0), np.sort(m2, axis=0),
                               rtol=1e-3, atol=1e-4)


def test_cluster_means_match_reference_definition():
    x = blobs(n=300, k=5)
    xj = jnp.asarray(x)
    mask = jnp.ones((300,), bool)
    _, labels, _, _ = km.kmeans_fit(xj, mask, jax.random.PRNGKey(0), n_clusters=5)
    means = np.asarray(km.cluster_means(xj, labels, mask, 5))
    lab = np.asarray(labels)
    for pos in range(5):
        sel = x[lab == pos]
        if len(sel):
            np.testing.assert_allclose(means[pos], sel.mean(axis=0),
                                       rtol=1e-4, atol=1e-5)


def test_kmeans_more_clusters_than_distinct_points():
    """Degenerate slides must not hang or NaN (reference would crash in
    sklearn; we keep finite centers via relocation)."""
    x = np.repeat(np.eye(3, 8, dtype=np.float32), 5, axis=0)  # 15 pts, 3 distinct
    _, labels, inertia, _ = km.kmeans_fit(jnp.asarray(x),
                                          jnp.ones((15,), bool),
                                          jax.random.PRNGKey(0), n_clusters=5)
    assert np.isfinite(float(inertia))
    assert float(inertia) < 1e-6  # every point sits on a center


def test_kmeans_cluster_features_backends_agree_on_blobs():
    x = blobs(n=500, d=12, k=10, spread=0.01)
    a = km.kmeans_cluster_features(x, n_clusters=10, backend="tpu")
    b = km.kmeans_cluster_features(x, n_clusters=10, backend="sklearn")
    # identical blob partitions -> identical cluster means up to permutation
    ai = np.lexsort(a.T)
    bi = np.lexsort(b.T)
    np.testing.assert_allclose(a[ai], b[bi], rtol=1e-3, atol=1e-4)


def test_kmeans_vmap_over_slides():
    xs = np.stack([blobs(seed=s) for s in range(4)])
    masks = jnp.ones(xs.shape[:2], bool)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    fit = jax.vmap(lambda x, m, k: km.kmeans_fit(x, m, k, n_clusters=8))
    centers, labels, inertia, _ = fit(jnp.asarray(xs), masks, keys)
    assert centers.shape == (4, 8, 16)
    assert np.all(np.isfinite(np.asarray(inertia)))


def test_run_kmeans_grouped_batching(tmp_path):
    """Multiple same-bucket slides go through one vmapped fit and all get
    correct cluster_features."""
    import os
    import h5py
    import pandas as pd
    from sequoia_tpu.pipeline import kmeans_stage

    rng = np.random.default_rng(0)
    rows = []
    for i in range(5):
        wsi = f"s{i}"
        d = tmp_path / "TCGA-X" / wsi
        os.makedirs(d)
        n = 200 + 17 * i  # same bucket (256) for i<4, bucket 512 for i=4? 268<512
        feats = blobs(n=n, d=16, k=6, seed=i)
        with h5py.File(d / f"{wsi}.h5", "w") as f:
            f.create_dataset("resnet_features", data=feats)
        rows.append({"wsi_file_name": wsi, "patient_id": f"P{i}",
                     "tcga_project": "TCGA-X", "rna_A": 1.0})
    df = pd.DataFrame(rows)
    done = kmeans_stage.run_kmeans(df, str(tmp_path), num_clusters=6,
                                   group_size=3, verbose=False)
    assert done == 5
    for i in range(5):
        with h5py.File(tmp_path / "TCGA-X" / f"s{i}" / f"s{i}.h5", "r") as f:
            cf = f["cluster_features"][:]
        assert cf.shape == (6, 16) and np.isfinite(cf).all()
        # cluster means must be near the 6 blob centers (tight blobs)
        feats = blobs(n=200 + 17 * i, d=16, k=6, seed=i)
        # each cluster mean should be close to at least one data point
        dmin = np.min(np.linalg.norm(cf[:, None] - feats[None], axis=2), axis=1)
        assert (dmin < 0.5).all()


def test_plusplus_indices_bit_equal_to_sklearn():
    """First-party kmeans++ draws the identical RandomState stream and float
    arithmetic as sklearn's seeding: chosen indices are bit-equal to the
    private ``_kmeans_plusplus`` on the same (centered) data."""
    try:
        from sklearn.cluster._kmeans import _kmeans_plusplus
    except ImportError:
        import pytest
        pytest.skip("sklearn private seeding API not importable")

    rng = np.random.default_rng(1)
    for n, d, k in [(500, 32, 8), (1200, 64, 100)]:
        x = (rng.normal(size=(n, d)) * 3
             + rng.normal(size=(1, d)) * 5).astype(np.float32)
        xc = x - x.mean(axis=0)
        _, ref_idx = _kmeans_plusplus(
            xc, k, x_squared_norms=(xc * xc).sum(1),
            sample_weight=np.ones(n, xc.dtype),
            random_state=np.random.RandomState(0))
        ours = km.plusplus_indices(xc, k, np.random.RandomState(0))
        np.testing.assert_array_equal(ours, ref_idx)


def test_hybrid_backend_matches_sklearn():
    """sklearn-seeded TPU Lloyd == full sklearn fit on well-posed data."""
    x = blobs(n=400, d=16, k=8, spread=0.03)
    ours = km.kmeans_cluster_features(x, n_clusters=8, seed=0, backend="hybrid")
    ref = km.kmeans_cluster_features(x, n_clusters=8, seed=0, backend="sklearn")
    # identical seeding + same Lloyd fixed point -> same clusters, possibly
    # permuted only if sklearn reorders (it doesn't for single init)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_empty_cluster_repair_on_degenerate_features():
    """Near-duplicate / exact-duplicate inputs (e.g. a collapsed backbone)
    must still yield a full set of non-empty clusters — sklearn's
    _relocate_empty_clusters guarantee — so cluster means stay finite.
    With fewer valid points than clusters, exactly n_valid clusters fill."""
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.ops import kmeans as km

    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, 64)).astype(np.float32)
    cases = [
        ("near-dup", np.repeat(base, 16, 0)
         + 1e-5 * rng.normal(size=(16, 64)).astype(np.float32), 8, 8),
        ("exact-dup", np.repeat(base, 16, 0), 8, 8),
        ("fewer-than-k", np.repeat(base, 5, 0), 8, 5),
    ]
    for name, xnp, k, want_filled in cases:
        x = jnp.asarray(xnp)
        mask = jnp.ones((xnp.shape[0],), bool)
        _, labels, _, _ = km.kmeans_fit(x, mask, jax.random.PRNGKey(0),
                                        n_clusters=k)
        cf = np.asarray(km.cluster_means(x, labels, mask, n_clusters=k))
        filled = np.isfinite(cf).all(axis=1).sum()
        assert filled == want_filled, (name, filled)
        counts = np.bincount(np.asarray(labels), minlength=k)
        assert (counts > 0).sum() == want_filled, (name, counts)


def test_unknown_backend_raises():
    import pytest

    feats = np.random.default_rng(0).normal(size=(20, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="backend"):
        km.kmeans_cluster_features(feats, n_clusters=4, backend="sklean")


def test_fewer_points_than_clusters_converges_quickly():
    """n_valid < k: the un-fillable empty clusters must not keep the Lloyd
    while_loop alive for all 300 iterations."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)), jnp.float32)
    mask = jnp.ones((5,), bool)
    _, labels, _, n_iter = km.kmeans_fit(x, mask, jax.random.PRNGKey(0),
                                         n_clusters=8)
    assert int(n_iter) < 20, int(n_iter)
    assert np.isfinite(np.asarray(labels)).all()
