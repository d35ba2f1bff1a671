"""Patient-level cross-validation splits with exact reference parity.

Contract (reference ``src/utils.py:44-110``): splits are computed over the
*unique patient ids* with sklearn ``KFold(n_splits, shuffle=True,
random_state=0)``; 10% of each fold's train patients become validation via
``train_test_split(test_size=0.1, random_state=0)``.  Row indices are then
recovered by patient membership.  sklearn runs on host — these few thousand
ids are not TPU work, and bit-exact split parity with the reference matters
more than speed here.
"""

from __future__ import annotations

import numpy as np
from sklearn.model_selection import KFold, train_test_split


def patient_kfold(patient_ids, n_splits: int = 5, random_state: int = 0,
                  valid_size: float = 0.1):
    """Returns (train_idx, valid_idx, test_idx) — lists of row-index arrays,
    one per fold, matching the reference ``patient_kfold`` exactly."""
    patient_ids = np.asarray(patient_ids)
    indices = np.arange(len(patient_ids))
    patients_unique = np.unique(patient_ids)

    skf = KFold(n_splits, shuffle=True, random_state=random_state)

    train_idx, valid_idx, test_idx = [], [], []
    for ind_train, ind_test in skf.split(patients_unique):
        patients_train = patients_unique[ind_train]
        patients_test = patients_unique[ind_test]

        test_idx.append(indices[np.isin(patient_ids, patients_test)])
        if valid_size > 0:
            # same seed as KFold (the reference hardcodes 0 for both; a
            # caller-supplied seed must apply to BOTH draws or
            # different-seed runs share their validation carve-out)
            patients_train, patients_valid = train_test_split(
                patients_train, test_size=valid_size,
                random_state=random_state)
            valid_idx.append(indices[np.isin(patient_ids, patients_valid)])
        train_idx.append(indices[np.isin(patient_ids, patients_train)])

    return train_idx, valid_idx, test_idx


def patient_split(patient_ids, random_state: int = 0):
    """Single 64/16/20 patient split (reference ``patient_split``)."""
    patient_ids = np.asarray(patient_ids)
    patients_unique = np.unique(patient_ids)
    patients_train, patients_test = train_test_split(
        patients_unique, test_size=0.2, random_state=random_state)
    patients_train, patients_val = train_test_split(
        patients_train, test_size=0.2, random_state=random_state)

    indices = np.arange(len(patient_ids))
    return (indices[np.isin(patient_ids, patients_train)],
            indices[np.isin(patient_ids, patients_val)],
            indices[np.isin(patient_ids, patients_test)])


def match_patient_split(patient_ids, split):
    """Recover row indices from a saved (train, valid, test) patient-id
    triple (reference ``match_patient_split``)."""
    patient_ids = np.asarray(patient_ids)
    indices = np.arange(len(patient_ids))
    train_patients, valid_patients, test_patients = split
    return (indices[np.isin(patient_ids, train_patients)],
            indices[np.isin(patient_ids, valid_patients)],
            indices[np.isin(patient_ids, test_patients)])


def match_patient_kfold(patient_ids, splits):
    """Recover per-fold row indices from saved patient-id triples
    (reference ``match_patient_kfold``) — the path used with the shipped
    ``patient_splits.zip`` artifacts."""
    patient_ids = np.asarray(patient_ids)
    indices = np.arange(len(patient_ids))
    train_idx, valid_idx, test_idx = [], [], []
    for train_patients, valid_patients, test_patients in splits:
        train_idx.append(indices[np.isin(patient_ids, train_patients)])
        valid_idx.append(indices[np.isin(patient_ids, valid_patients)])
        test_idx.append(indices[np.isin(patient_ids, test_patients)])
    return train_idx, valid_idx, test_idx


def ensure_legacy_pandas_unpickle() -> None:
    """Make pandas>=2 unpickle pandas-1.x artifacts.

    The reference's shipped ``patient_splits.zip`` fold arrays pickle
    pandas-1.x ``Int64Index`` objects whose module
    (``pandas.core.indexes.numeric``) no longer exists; alias the removed
    classes to ``pd.Index`` so ``np.load(allow_pickle=True)`` works."""
    import sys
    import types

    import pandas as pd

    name = "pandas.core.indexes.numeric"
    if name in sys.modules or hasattr(
            getattr(pd.core.indexes, "numeric", None), "Int64Index"):
        return
    mod = types.ModuleType(name)
    mod.Int64Index = mod.Float64Index = mod.UInt64Index = pd.Index
    sys.modules[name] = mod


def load_shipped_patient_splits(path):
    """Load a reference ``TCGA-{CANCER}.npy`` split artifact (dict
    ``fold_i -> {train, val, test}`` patient-id arrays, from the reference's
    ``patient_splits.zip``) into match_patient_kfold's input format."""
    ensure_legacy_pandas_unpickle()
    obj = np.load(path, allow_pickle=True).item()
    # iterate the fold keys actually present (len(obj) would misalign on
    # 1-indexed folds or extra metadata keys)
    fold_keys = sorted((k for k in obj
                        if isinstance(k, str) and k.startswith("fold_")),
                       key=lambda k: int(k.split("_")[1]))
    if not fold_keys:  # integer-keyed artifact
        fold_keys = sorted(k for k in obj if isinstance(k, int))
    splits = []
    for k in fold_keys:
        fold = obj[k]
        splits.append((np.asarray(fold["train"]), np.asarray(fold["val"]),
                       np.asarray(fold["test"])))
    return splits


def load_test_wsis(path):
    """Load the reference's ``test_wsis.pkl`` artifact
    ({cancer: {split_i: [wsi ids]}}).  Returns the dict unchanged."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def filter_by_test_wsis(df, test_wsis, cancer: str, split: int | str):
    """Rows of ``df`` whose wsi_file_name is in the artifact's
    {cancer}/{split} test list."""

    key = split if split in test_wsis.get(cancer, {}) else f"split_{split}"
    wanted = set(map(str, test_wsis[cancer][key]))
    keep = df["wsi_file_name"].astype(str).isin(wanted)
    return df[keep].reset_index(drop=True)
