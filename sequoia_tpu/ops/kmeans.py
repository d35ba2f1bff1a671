"""K-means on TPU: kmeans++ seeding + Lloyd iterations as XLA GEMMs.

Behavior contract: the reference clusters each slide's patch features with
``sklearn.cluster.KMeans(n_clusters=100, random_state=0)`` and stores the
*mean feature per final label* as the slide's 100 ``cluster_features``
(reference ``pre_processing/kmean_features.py:96-108``).  This module
reproduces that algorithm (kmeans++ init, Lloyd with sklearn's
relative-tolerance stopping rule ``tol * mean(var(X))``, empty-cluster
relocation to farthest points) with everything on the MXU:

* distances: ``|x|^2 + |c|^2 - 2 x @ c^T`` — one (N,D)x(D,k) GEMM per step;
* assignment counts/sums: one-hot (N,k) matmuls — no scatters;
* masked: padded rows (``mask=False``) never win an assignment and never
  contribute, so ragged slides batch into fixed shapes and ``vmap`` runs
  many slides per launch.

``kmeans_sklearn`` is the host fallback for bit-parity with reference
artifacts (sklearn is the reference's implementation, so parity is exact by
construction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

def _pairwise_sq_dist(x, centers):
    """(N, D), (k, D) -> (N, k) squared distances (f32 accumulate)."""
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    cc = jnp.sum(centers * centers, axis=1)
    xc = jnp.dot(x, centers.T, precision=prec, preferred_element_type=jnp.float32)
    return jnp.maximum(xx + cc - 2.0 * xc, 0.0)


def _plusplus_init(key, x, mask, k: int):
    """kmeans++ (D^2 sampling) over the valid rows."""
    n, d = x.shape
    logm = jnp.where(mask, 0.0, -jnp.inf)

    k0, key = jax.random.split(key)
    first = jax.random.categorical(k0, logm)
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])
    d2_0 = jnp.where(mask, jnp.sum((x - x[first]) ** 2, axis=1), 0.0)

    def body(i, carry):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        logits = jnp.where(mask & (d2 > 0), jnp.log(jnp.maximum(d2, 1e-30)), -jnp.inf)
        # all-zero d2 (fewer distinct points than clusters): fall back to mask
        logits = jnp.where(jnp.all(jnp.isneginf(logits)), logm, logits)
        idx = jax.random.categorical(sub, logits)
        c = x[idx]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.where(mask, jnp.sum((x - c) ** 2, axis=1), 0.0))
        return centers, d2, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, d2_0, key))
    return centers


def _pallas_tile_n(n: int) -> int | None:
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return None


def _lloyd(x, mask, centers, max_iter: int, tol_abs, use_pallas: bool = False,
           pallas_interpret: bool = False):
    n, d = x.shape
    k = centers.shape[0]
    maskf = mask.astype(x.dtype)

    tile_n = _pallas_tile_n(n) if use_pallas else None
    use_pallas = use_pallas and tile_n is not None

    def assign(centers):
        d2 = _pairwise_sq_dist(x, centers)
        labels = jnp.argmin(d2, axis=1)
        best = jnp.min(d2, axis=1)
        return labels, jnp.where(mask, best, 0.0)

    def stats(centers):
        """(sums (k,D), counts (k,), best (N,)) for the current assignment."""
        if use_pallas:
            from sequoia_tpu.ops import pallas_kmeans

            kpad = ((k + 127) // 128) * 128
            cpad = jnp.pad(centers, ((0, kpad - k), (0, 0)),
                           constant_values=1e8)  # sentinels never win argmin
            sums, counts, _, best = pallas_kmeans.lloyd_stats(
                x, mask, cpad, tile_n=tile_n, interpret=pallas_interpret)
            return sums[:k], counts[:k], best
        labels, best = assign(centers)
        onehot = (labels[:, None] == jnp.arange(k)[None, :]).astype(x.dtype)
        onehot = onehot * maskf[:, None]
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        sums = jnp.dot(onehot.T, x, precision=prec,
                       preferred_element_type=jnp.float32)
        return sums, jnp.sum(onehot, axis=0), best

    # with fewer valid points than clusters, at least k - n_valid clusters
    # can NEVER fill — only un-expected empties should keep the loop alive
    # (jnp.any(empty) made degenerate slides burn all max_iter iterations)
    min_empty = jnp.maximum(0, k - jnp.sum(mask))

    def step(state):
        centers, _, it, _ = state
        sums, counts, best = stats(centers)
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                centers)
        # empty-cluster relocation: farthest valid points become centers
        # (top_k, not a full N-row argsort — only k candidates are ever
        # used, and ties keep index order in both)
        empty = counts == 0
        kk = min(k, n)  # top_k needs k <= n; n < k repeats the farthest
        _, far = jax.lax.top_k(best, kk)  # masked rows have best=0 -> last
        pos = jnp.cumsum(empty.astype(jnp.int32)) - 1
        candidates = x[far[jnp.clip(pos, 0, kk - 1)]]
        new_centers = jnp.where(empty[:, None], candidates, new_centers)

        shift = jnp.sum((new_centers - centers) ** 2)
        return new_centers, shift, it + 1, jnp.sum(empty) > min_empty

    def cond(state):
        _, shift, it, had_empty = state
        return (it < max_iter) & ((shift > tol_abs) | had_empty | (it == 0))

    init = (centers, jnp.asarray(jnp.inf, x.dtype), jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    centers, _, n_iter, _ = jax.lax.while_loop(cond, step, init)
    labels, best = assign(centers)
    # Final-assignment empty-cluster repair (sklearn _relocate_empty_clusters
    # semantics): on degenerate inputs (e.g. near-duplicate points) argmin
    # tie-breaking can leave a relocated center with zero members, which
    # would surface as NaN cluster means downstream.  One round per cluster:
    # fill each still-empty cluster with the farthest valid point currently
    # belonging to a DONOR cluster (>=2 members, so no cluster is drained).
    # With n_valid >= k this terminates with every cluster non-empty; with
    # fewer valid points than clusters the un-fillable ones stay empty.
    cluster_ids = jnp.arange(k)
    counts0 = jnp.sum((labels[:, None] == cluster_ids[None, :])
                      & mask[:, None], axis=0)

    def fix_one(carry, c):
        # counts rides the carry and is updated incrementally (one label
        # moves per step) — O(N*k) total instead of an (N, k) one-hot
        # reduction per step
        labels, centers, best, counts = carry
        donor_ok = counts[labels] >= 2
        score = jnp.where(mask & donor_ok, best, -jnp.inf)
        p = jnp.argmax(score)
        take = (counts[c] == 0) & jnp.isfinite(score[p])
        # keep the returned triple self-consistent (sklearn semantics: the
        # relocated point becomes the cluster's center, so its distance —
        # and inertia contribution — drops to 0)
        counts = jnp.where(take, counts.at[labels[p]].add(-1).at[c].add(1),
                           counts)
        labels = jnp.where(take, labels.at[p].set(c), labels)
        centers = jnp.where(take, centers.at[c].set(x[p]), centers)
        best = jnp.where(take, best.at[p].set(0.0), best)
        return (labels, centers, best, counts), None

    (labels, centers, best, _), _ = jax.lax.scan(
        fix_one, (labels, centers, best, counts0), cluster_ids)
    inertia = jnp.sum(best)
    return centers, labels, inertia, n_iter


@partial(jax.jit, static_argnames=("n_clusters", "max_iter", "use_pallas",
                                   "pallas_interpret"))
def kmeans_fit(x: jax.Array, mask: jax.Array, key: jax.Array,
               n_clusters: int = 100, max_iter: int = 300, tol: float = 1e-4,
               use_pallas: bool = False, pallas_interpret: bool = False):
    """One slide: x (N, D) f32 padded, mask (N,) bool.

    Returns (centers (k,D), labels (N,) — garbage on masked rows, inertia,
    n_iter).  vmap over a leading slide axis for multi-slide batches.

    ``use_pallas=True`` runs the Lloyd inner step through the fused Pallas
    kernel (ops/pallas_kmeans.py) when shapes allow; identical math.
    """
    x = x.astype(jnp.float32)  # mixed-precision input would mismatch the
    # while_loop carry dtype (sums accumulate in f32) — an opaque trace error
    maskf = mask.astype(x.dtype)
    n_valid = jnp.maximum(jnp.sum(maskf), 1.0)
    mean = jnp.sum(x * maskf[:, None], axis=0) / n_valid
    var = jnp.sum(((x - mean) * maskf[:, None]) ** 2, axis=0) / n_valid
    tol_abs = tol * jnp.mean(var)  # sklearn's relative tolerance

    centers = _plusplus_init(key, x, mask, n_clusters)
    return _lloyd(x, mask, centers, max_iter, tol_abs, use_pallas,
                  pallas_interpret)


@partial(jax.jit, static_argnames=("n_clusters",))
def cluster_means(x: jax.Array, labels: jax.Array, mask: jax.Array,
                  n_clusters: int = 100) -> jax.Array:
    """Mean raw feature per final label — the reference's ``cluster_features``
    definition (mean over members, NaN for empty clusters, matching
    ``np.mean`` over an empty slice)."""
    k = n_clusters
    onehot = (labels[:, None] == jnp.arange(k)[None, :]).astype(x.dtype)
    onehot = onehot * mask.astype(x.dtype)[:, None]
    counts = jnp.sum(onehot, axis=0)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sums = jnp.dot(onehot.T, x, precision=prec, preferred_element_type=jnp.float32)
    return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
                     jnp.nan)


def kmeans_cluster_features(features: np.ndarray, n_clusters: int = 100,
                            seed: int = 0, backend: str = "tpu") -> np.ndarray:
    """(N, D) patch features -> (k, D) cluster-mean features.

    backend='tpu': this module's kmeans++/Lloyd (fast path).
    backend='hybrid': sklearn-exact kmeans++ seeding on host + Lloyd on TPU
    (near-bit-parity at TPU speed; the seeding stream matches sklearn
    >= 1.8 — older sklearns used a float64 stable_cumsum (<1.8) and a
    randint first draw (<1.3), so artifacts produced by those versions
    need backend='sklearn' for exactness).
    backend='sklearn': exact reference implementation (bit-parity with
    artifacts produced by the reference pipeline, any sklearn version).
    """
    features = np.asarray(features, np.float32)
    if backend == "hybrid":
        centers = sklearn_plusplus_centers(features, n_clusters, seed)
        x = jnp.asarray(features)
        mask = jnp.ones((features.shape[0],), bool)
        _, labels, _, _ = kmeans_lloyd(x, mask, jnp.asarray(centers))
        return np.asarray(cluster_means(x, labels, mask, n_clusters=n_clusters))
    if backend == "sklearn":
        from sklearn.cluster import KMeans

        labels = KMeans(n_clusters=n_clusters, random_state=seed).fit(features).labels_
        means = [np.mean(features[labels == pos], axis=0) if np.any(labels == pos)
                 else np.full(features.shape[1], np.nan, np.float32)
                 for pos in range(n_clusters)]
        return np.asarray(means, dtype=np.float32)

    if backend != "tpu":
        # a typo'd backend silently running the non-parity path would write
        # wrong cluster_features that the skip-if-present rule makes sticky
        raise ValueError(f"backend must be 'tpu', 'hybrid', or 'sklearn'; "
                         f"got {backend!r}")
    x = jnp.asarray(features)
    mask = jnp.ones((features.shape[0],), bool)
    _, labels, _, _ = kmeans_fit(x, mask, jax.random.PRNGKey(seed),
                                 n_clusters=n_clusters)
    return np.asarray(cluster_means(x, labels, mask, n_clusters=n_clusters))


@partial(jax.jit, static_argnames=("max_iter", "use_pallas"))
def kmeans_lloyd(x: jax.Array, mask: jax.Array, init_centers: jax.Array,
                 max_iter: int = 300, tol: float = 1e-4,
                 use_pallas: bool = False):
    """Lloyd iterations from explicit initial centers (for host-side
    seeding).  Same return contract as :func:`kmeans_fit`."""
    x = x.astype(jnp.float32)
    init_centers = init_centers.astype(jnp.float32)
    maskf = mask.astype(x.dtype)
    n_valid = jnp.maximum(jnp.sum(maskf), 1.0)
    mean = jnp.sum(x * maskf[:, None], axis=0) / n_valid
    var = jnp.sum(((x - mean) * maskf[:, None]) ** 2, axis=0) / n_valid
    tol_abs = tol * jnp.mean(var)
    return _lloyd(x, mask, init_centers, max_iter, tol_abs, use_pallas)


def _sklearn_sq_dists(A: np.ndarray, B: np.ndarray,
                      b_norms: np.ndarray | None = None) -> np.ndarray:
    """Squared euclidean distances with sklearn's exact float semantics.

    For float32 inputs sklearn's ``_euclidean_distances`` ignores passed
    norms, upcasts chunks to float64, computes ``|a|^2 + |b|^2 - 2 a.b``,
    downcasts to float32 and clips at 0.  Chunking is over samples (never
    features), so per-element results are chunk-independent — one full
    float64 pass reproduces it bit-for-bit.
    """
    if A.dtype == np.float32 or B.dtype == np.float32:
        A64 = A.astype(np.float64)
        B64 = B.astype(np.float64)
        d = -2.0 * (A64 @ B64.T)
        d += (A64 * A64).sum(axis=1)[:, None]
        d += (B64 * B64).sum(axis=1)[None, :]
        d = d.astype(np.float32)
    else:
        d = -2.0 * (A @ B.T)
        d += (A * A).sum(axis=1)[:, None]
        d += (b_norms if b_norms is not None
              else (B * B).sum(axis=1))[None, :]
    np.maximum(d, 0.0, out=d)
    return d


def plusplus_indices(X: np.ndarray, n_clusters: int,
                     random_state: np.random.RandomState) -> np.ndarray:
    """First-party kmeans++ (greedy D^2 sampling, Arthur & Vassilvitskii)
    drawing the identical RandomState stream and float arithmetic as
    sklearn's seeding, so ``X[plusplus_indices(...)]`` equals the centers
    ``KMeans(n_clusters, random_state=seed)`` starts Lloyd from — without
    importing sklearn's private ``_kmeans_plusplus``.

    Contract matched (behavior, not code): n_local_trials = 2 + int(log(k));
    first center ~ ``random_state.choice``; per round, n_local_trials
    candidates via ``uniform * current_pot`` searchsorted into the cumulative
    D^2 mass, greedy pick minimizing the resulting potential.
    """
    n_samples = X.shape[0]
    n_local_trials = 2 + int(np.log(n_clusters))
    weights = np.ones(n_samples, X.dtype) / n_samples

    indices = np.full(n_clusters, -1, dtype=int)
    indices[0] = random_state.choice(n_samples, p=weights)
    closest = _sklearn_sq_dists(X[indices[0]][None], X)[0]
    sample_weight = np.ones(n_samples, X.dtype)
    current_pot = closest @ sample_weight

    for c in range(1, n_clusters):
        rand_vals = random_state.uniform(size=n_local_trials) * current_pot
        candidate_ids = np.searchsorted(np.cumsum(sample_weight * closest),
                                        rand_vals)
        np.clip(candidate_ids, None, closest.size - 1, out=candidate_ids)

        dist = _sklearn_sq_dists(X[candidate_ids], X)
        np.minimum(closest, dist, out=dist)
        pots = dist @ sample_weight.reshape(-1, 1)

        best = int(np.argmin(pots))
        current_pot = pots[best]
        closest = dist[best]
        indices[c] = candidate_ids[best]

    return indices


def sklearn_plusplus_centers(features: np.ndarray, n_clusters: int,
                             seed: int = 0) -> np.ndarray:
    """kmeans++ seeding with the identical RNG stream and float arithmetic
    as ``sklearn.cluster.KMeans(random_state=seed)`` (default single init) —
    the 'hybrid' parity path from SURVEY.md section 7.4: seed on host with
    sklearn bit-parity, run Lloyd on TPU.

    First-party reimplementation (no sklearn private API).  Mirrors
    ``KMeans.fit``'s mean-centering before seeding (reference
    ``pre_processing/kmean_features.py:96``): candidate selection happens in
    the same centered float domain as sklearn's, so the chosen indices match
    bit-for-bit; returned centers are the original (uncentered) rows.
    """
    X = np.ascontiguousarray(features, np.float32)
    Xc = X - X.mean(axis=0)  # KMeans.fit centers data before seeding
    rs = np.random.RandomState(seed) if not isinstance(
        seed, np.random.RandomState) else seed
    idx = plusplus_indices(Xc, n_clusters, rs)
    return X[idx].astype(np.float32)
