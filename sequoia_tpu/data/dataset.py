"""Host data plane: ref-file parsing, HDF5 feature store access, batching.

On-disk contracts (identical to the reference so artifacts interoperate):

* ref file: CSV with columns ``wsi_file_name, patient_id, rna_{GENE}...``
  and optionally ``tcga_project`` (reference ``examples/ref_file.csv``,
  ``README.md`` input schema).
* feature store: ``{features_path}/{project}/{wsi}/{wsi}.h5`` holding
  ``resnet_features`` (N,2048) / ``uni_features`` (N,1024) /
  ``cluster_features`` (100,D) datasets (reference
  ``compute_features_hdf5.py`` + ``kmean_features.py`` outputs).
* non-GTEx paths strip a stray ``.svs`` suffix (reference
  ``read_data.py:44-46``); unreadable slides are skipped, mirroring the
  reference's None-collate filtering (``utils.py:10-18``).

TPU-first batching: instead of torch's dynamic last batch, ``BatchLoader``
pads every batch to a fixed ``batch_size`` and carries a ``valid`` mask, so
the jitted train/eval step compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import h5py
import numpy as np
import pandas as pd


def read_ref_file(path_or_df, tcga_projects=None) -> pd.DataFrame:
    df = pd.read_csv(path_or_df) if isinstance(path_or_df, str) else path_or_df
    if tcga_projects and "tcga_project" in df.columns:
        df = df[df["tcga_project"].isin(list(tcga_projects))].reset_index(drop=True)
    return df


def gene_names(df: pd.DataFrame) -> list[str]:
    """Gene order contract: the ``rna_`` columns in file order."""
    return [c[4:] for c in df.columns if c.startswith("rna_")]


def slide_h5_path(features_path: str, project: str, wsi: str) -> str:
    path = os.path.join(features_path, str(project), str(wsi), str(wsi) + ".h5")
    # deliberate reference-quirk preservation (read_data.py:45-46): the
    # GTEX check and the .svs strip operate on the WHOLE joined path —
    # including the store root — exactly as the reference does; stores
    # written by either pipeline must resolve to the same file
    if "GTEX" not in path:
        path = path.replace(".svs", "")
    return path


def filter_no_features(df: pd.DataFrame, feature_path: str,
                       feature_name: str = "cluster_features",
                       verbose: bool = True) -> pd.DataFrame:
    """Drop rows whose feature ``.h5`` is missing or lacks ``feature_name``
    (reference ``src/utils.py:21-41`` semantics)."""
    keep = []
    for _, row in df.iterrows():
        project = row.get("tcga_project", "")
        path = slide_h5_path(feature_path, project, row["wsi_file_name"])
        ok = False
        if os.path.exists(path):
            try:
                with h5py.File(path, "r") as f:
                    ok = feature_name in f.keys()
            except OSError:
                ok = False
        keep.append(ok)
    out = df[np.asarray(keep, bool)].reset_index(drop=True)
    if verbose:
        print(f"filter_no_features[{feature_name}]: {df.shape[0]} -> {out.shape[0]} slides")
    return out


@dataclasses.dataclass
class FeatureDataset:
    """Reference ``SuperTileRNADataset`` equivalent over the feature store.

    ``feature_use`` is honored for both feature loading and feature-dim
    probing (the reference's constructor had a dead ``feature_use``; the
    intended dataset is ``cluster_features`` — reference ``read_data.py:48``).
    """

    df: pd.DataFrame
    features_path: str
    feature_use: str = "cluster_features"

    def __post_init__(self):
        self.df = self.df.reset_index(drop=True)
        self._rna_cols = [c for c in self.df.columns if c.startswith("rna_")]
        self.num_genes = len(self._rna_cols)
        self.genes = [c[4:] for c in self._rna_cols]
        self.feature_dim = self._probe_feature_dim()

    def _probe_feature_dim(self) -> int:
        for i in range(len(self.df)):
            feats = self.load_features(i)
            if feats is not None:
                self.num_tokens = int(feats.shape[0])
                return feats.shape[-1]
        raise FileNotFoundError(
            f"No readable '{self.feature_use}' features under {self.features_path}")

    def __len__(self) -> int:
        return len(self.df)

    def h5_path(self, idx: int) -> str:
        row = self.df.iloc[idx]
        return slide_h5_path(self.features_path, row.get("tcga_project", ""),
                             row["wsi_file_name"])

    def load_features(self, idx: int) -> np.ndarray | None:
        """(tokens, D) float32, or None if unreadable (skipped downstream)."""
        try:
            with h5py.File(self.h5_path(idx), "r") as f:
                return np.asarray(f[self.feature_use][:], dtype=np.float32)
        except (OSError, KeyError):
            return None

    def load_rna(self, idx: int) -> np.ndarray:
        row = self.df.iloc[idx]
        return row[self._rna_cols].to_numpy(dtype=np.float32)

    def meta(self, idx: int) -> tuple[str, str]:
        row = self.df.iloc[idx]
        return str(row["wsi_file_name"]), str(row.get("tcga_project", ""))


@dataclasses.dataclass
class Batch:
    features: np.ndarray  # (B, T, D) f32, zero-padded rows where ~valid
    rna: np.ndarray       # (B, G) f32
    valid: np.ndarray     # (B,) bool — False for pad entries
    wsi: list[str]
    project: list[str]

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())


class BatchLoader:
    """Fixed-shape batches with a validity mask.

    Bad samples (unreadable ``.h5``) are dropped before batching, like the
    reference's collate filter.  With ``shuffle=True`` order is drawn from a
    ``numpy.random.Generator`` seeded per epoch.

    ``num_tokens``: pad/truncate every batch to this token count.  Default
    None pads to the per-batch max — for ``cluster_features`` (the
    reference training contract) every slide has exactly ``num_clusters``
    tokens so shapes are already fixed; for RAGGED raw-feature stores pass
    an explicit value, otherwise each distinct batch shape retraces the
    jitted step.
    """

    def __init__(self, dataset: FeatureDataset, batch_size: int = 16,
                 shuffle: bool = False, seed: int = 0, num_tokens: int | None = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_tokens = num_tokens
        self._epoch = 0

    def __iter__(self) -> Iterator[Batch]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        B = self.batch_size
        pend_feats, pend_rna, pend_wsi, pend_proj = [], [], [], []

        def flush():
            n = len(pend_feats)
            T = self.num_tokens or max(f.shape[0] for f in pend_feats)
            D = pend_feats[0].shape[-1]
            feats = np.zeros((B, T, D), np.float32)
            for i, f in enumerate(pend_feats):
                feats[i, :f.shape[0]] = f[:T]
            rna = np.zeros((B, self.ds.num_genes), np.float32)
            rna[:n] = np.stack(pend_rna)
            valid = np.zeros((B,), bool)
            valid[:n] = True
            return Batch(feats, rna, valid, list(pend_wsi), list(pend_proj))

        for idx in order:
            f = self.ds.load_features(int(idx))
            if f is None:
                continue
            pend_feats.append(f)
            pend_rna.append(self.ds.load_rna(int(idx)))
            wsi, proj = self.ds.meta(int(idx))
            pend_wsi.append(wsi)
            pend_proj.append(proj)
            if len(pend_feats) == B:
                yield flush()
                pend_feats, pend_rna, pend_wsi, pend_proj = [], [], [], []
        if pend_feats:
            yield flush()


class PrefetchIterator:
    """Background-thread prefetch wrapping any batch iterator.

    h5py releases the GIL during HDF5 I/O, so a single reader thread keeps
    the device fed (the double-buffered host pipeline from SURVEY.md
    section 5: host I/O must overlap device compute once the compute side is
    20x faster)."""

    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2, transform=None):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()  # consumer gone: unblock the worker

        def put(item) -> bool:
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in iterable:
                    if transform is not None:
                        # runs on THIS thread: host->device transfers issued
                        # here overlap the consumer's compute dispatches
                        # (jax transfers are thread-safe and async)
                        item = transform(item)
                    if not put(item):
                        return
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                if not put(self._SENTINEL):
                    try:  # best-effort: a blocked consumer still wakes
                        self._q.put_nowait(self._SENTINEL)
                    except queue.Full:
                        pass

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set() or getattr(self, "_done", False):
            raise StopIteration  # exhausted iterators must KEEP raising —
            # another q.get() here would block forever (worker exited)
        item = self._q.get()
        if item is self._SENTINEL:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the reader thread without draining (abandoned iteration —
        e.g. an exception mid-epoch); without this the worker would block
        in q.put for the process lifetime, pinning the underlying loader."""
        self._stop.set()
        self._t.join()

    def __del__(self):  # GC fallback: unblock, but never join from a finalizer
        self._stop.set()


def prefetch(loader, depth: int = 2, transform=None):
    """Iterate ``loader`` with ``depth`` batches read ahead on a thread.

    ``transform`` (optional) is applied to each batch ON the reader thread
    before it is queued — pass a host->device upload here so transfers
    overlap the consumer's compute (double-buffered h2d)."""
    return PrefetchIterator(iter(loader), depth=depth, transform=transform)
