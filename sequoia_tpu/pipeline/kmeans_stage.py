"""Stage 3 — k-means aggregation: patch features -> 100 cluster features.

On-disk contract (reference ``pre_processing/kmean_features.py:65-113``): opens the
slide's feature ``.h5`` in r+, skips slides with fewer patches than clusters
or with ``cluster_features`` already present, appends a ``cluster_features``
dataset of shape (num_clusters, D) holding the mean raw feature per final
k-means label.

The reference resolves every slide's project from row 0 of the ref file
(``kmean_features.py:70``) — a recorded bug; here each row's own
``tcga_project`` is used (GTEx mode keeps the explicit ``--gtex_tissue``
override).

TPU-first: slides are padded to shape buckets and the kmeans++/Lloyd fit
runs jitted per bucket (few compilations) with the host loop pipelining
HDF5 reads.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

import jax
import jax.numpy as jnp

from sequoia_tpu.ops import kmeans as km

_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 4095) // 4096) * 4096


def cluster_features_for(features: np.ndarray, n_clusters: int, seed: int,
                         backend: str = "tpu") -> np.ndarray:
    if backend in ("sklearn", "hybrid"):
        return km.kmeans_cluster_features(features, n_clusters, seed, backend)
    n, d = features.shape
    nb = _bucket(n)
    x = np.zeros((nb, d), np.float32)
    x[:n] = features
    mask = np.zeros((nb,), bool)
    mask[:n] = True
    xj, mj = jnp.asarray(x), jnp.asarray(mask)
    _, labels, _, _ = km.kmeans_fit(xj, mj, jax.random.PRNGKey(seed),
                                    n_clusters=n_clusters)
    return np.asarray(km.cluster_means(xj, labels, mj, n_clusters=n_clusters))


def _write_cluster_features(path: str, means: np.ndarray) -> bool:
    try:
        with h5py.File(path, "r+") as f:
            if "cluster_features" in f:
                return False
            f.create_dataset("cluster_features", data=means)
        return True
    except OSError as e:
        print(f"Error writing cluster_features to {path}: {e}")
        return False


def run_kmeans(df, feature_path: str, *, num_clusters: int = 100,
               feat_name: str = "resnet_features", seed: int = 0,
               backend: str = "tpu", gtex_tissue: str | None = None,
               group_size: int = 8, use_pallas: bool = False,
               verbose: bool = True) -> int:
    """Append ``cluster_features`` for every slide in the ref file.

    backend='tpu' batches up to ``group_size`` slides of the same padded
    shape bucket through a single vmapped kmeans fit per launch; 'sklearn'
    runs the exact reference implementation per slide on host.
    Returns the number of slides clustered.
    """
    df = df.drop_duplicates(["wsi_file_name"])
    done = 0
    # bucket by (padded-N, feature-dim): mixed-width stores (e.g. 2048-d
    # 256px slides alongside 8192-d 448px ones) must not share a batch
    pending: dict[tuple[int, int], list[tuple[str, np.ndarray, int]]] = {}

    vfit = jax.vmap(lambda x, m, k: km.kmeans_fit(
        x, m, k, n_clusters=num_clusters, use_pallas=use_pallas))
    vmeans = jax.vmap(lambda x, l, m: km.cluster_means(
        x, l, m, n_clusters=num_clusters))

    def flush_bucket(key_: tuple[int, int]) -> int:
        group = pending.pop(key_, [])
        if not group:
            return 0
        nb, d = key_
        xs = np.zeros((len(group), nb, d), np.float32)
        masks = np.zeros((len(group), nb), bool)
        for i, (_, feats, n) in enumerate(group):
            xs[i, :n] = feats
            masks[i, :n] = True
        xj, mj = jnp.asarray(xs), jnp.asarray(masks)
        keys = jnp.stack([jax.random.PRNGKey(seed)] * len(group))
        _, labels, _, _ = vfit(xj, mj, keys)
        means = np.asarray(vmeans(xj, labels, mj))
        wrote = 0
        for i, (path, _, _) in enumerate(group):
            wrote += int(_write_cluster_features(path, means[i]))
        return wrote

    for _, row in df.iterrows():
        wsi = str(row["wsi_file_name"])
        if gtex_tissue is not None:
            project = gtex_tissue
        else:
            project = row.get("tcga_project", "")
            wsi = wsi.replace(".svs", "")

        path = os.path.join(feature_path, str(project), wsi, wsi + ".h5")
        try:
            with h5py.File(path, "r") as f:
                if feat_name not in f:
                    if verbose:
                        print(f"No {feat_name} for {path}")
                    continue
                if f[feat_name].shape[0] < num_clusters:
                    if verbose:
                        print(f"{wsi} less number of patches than clusters")
                    continue
                if "cluster_features" in f.keys():
                    if verbose:
                        print(f"{wsi}: Cluster feature already available")
                    continue
                features = np.asarray(f[feat_name][:], np.float32)
        except OSError:
            print(f"Cannot open file {path}")
            continue

        if backend in ("sklearn", "hybrid"):
            means = cluster_features_for(features, num_clusters, seed, backend)
            done += int(_write_cluster_features(path, means))
            continue

        key_ = (_bucket(features.shape[0]), features.shape[1])
        pending.setdefault(key_, []).append(
            (path, features, features.shape[0]))
        if len(pending[key_]) == group_size:
            done += flush_bucket(key_)

    for key_ in list(pending):
        done += flush_bucket(key_)
    return done
