"""Pallas Lloyd-step kernel: numerics vs the XLA reference path
(interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from sequoia_tpu.ops import pallas_kmeans as pk


def xla_lloyd_stats(x, maskf, centers):
    d2 = (jnp.sum(x * x, 1, keepdims=True) + jnp.sum(centers * centers, 1)
          - 2 * x @ centers.T)
    d2 = jnp.maximum(d2, 0.0)
    labels = jnp.argmin(d2, axis=1)
    onehot = (labels[:, None] == jnp.arange(centers.shape[0])).astype(jnp.float32)
    onehot = onehot * maskf[:, None]
    return (onehot.T @ x, onehot.sum(0),
            jnp.sum(jnp.min(d2, 1) * maskf))


def test_lloyd_stats_matches_xla():
    rng = np.random.default_rng(0)
    n, d, k = 1024, 256, 128
    x = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[1000:] = False
    centers = rng.normal(size=(k, d)).astype(np.float32)

    sums, counts, inertia, best = pk.lloyd_stats(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(centers),
        tile_n=256, interpret=True)
    ws, wc, wi = xla_lloyd_stats(jnp.asarray(x),
                                 jnp.asarray(mask, np.float32)[...],
                                 jnp.asarray(centers))
    np.testing.assert_allclose(np.asarray(counts), np.asarray(wc), atol=0)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ws),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(inertia), float(wi), rtol=1e-5)
    assert float(counts.sum()) == 1000.0
    assert best.shape == (1024,)
    assert (np.asarray(best)[1000:] == 0).all()  # masked rows contribute 0


def test_kmeans_fit_pallas_backend_matches_xla():
    from sequoia_tpu.ops import kmeans as km

    rng = np.random.default_rng(1)
    n, d, k = 512, 128, 10
    centers = rng.normal(size=(k, d)) * 3
    x = (centers[rng.integers(0, k, n)] +
         0.05 * rng.normal(size=(n, d))).astype(np.float32)
    mask = jnp.ones((n,), bool)

    c1, l1, i1, _ = km.kmeans_fit(jnp.asarray(x), mask, jax.random.PRNGKey(0),
                                  n_clusters=k)
    c2, l2, i2, _ = km.kmeans_fit(jnp.asarray(x), mask, jax.random.PRNGKey(0),
                                  n_clusters=k, use_pallas=True,
                                  pallas_interpret=True)
    # same seed + same math -> identical clustering (inertia within fp noise)
    np.testing.assert_allclose(float(i1), float(i2), rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-4, atol=1e-5)
