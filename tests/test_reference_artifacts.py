"""Import the reference's REAL released artifacts and load them through our
loaders (tools/import_reference_artifacts.py + data/splits.py).

Contracts under test: reference ``examples/gene_list.csv`` (the 20,820-gene
order behind the released HF weights), ``pre_processing/patient_splits.zip``
(16 cancers x 5 folds of patient IDs, pandas-1.x pickles),
``pre_processing/test_wsis.pkl``, ``src/folds/test-{c}-{i}.npy``.
Skipped when no reference checkout is present.
"""

import os

import numpy as np
import pandas as pd
import pytest

from sequoia_tpu.data import splits as splits_mod

REFERENCE = os.environ.get("SEQUOIA_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "examples")),
    reason="no reference checkout available")


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    from tools import import_reference_artifacts as ira

    out = tmp_path_factory.mktemp("refart")
    summary = ira.run(REFERENCE, str(out))
    return out, summary


def test_summary_schema(imported):
    _, s = imported
    assert s["n_genes"] == 20820
    assert s["gene_order_matches_ref_file"]
    assert s["patient_split_files"] == 16
    assert s["folds_per_cancer"] == [5]
    assert s["test_wsis_cancers"] == 16
    assert s["fold_arrays"] == 80


def test_patient_splits_load_and_are_disjoint(imported):
    out, _ = imported
    path = out / "splits" / "patient_splits" / "TCGA-BRCA.npy"
    folds = splits_mod.load_shipped_patient_splits(str(path))
    assert len(folds) == 5
    for train, val, test in folds:
        train, val, test = set(map(str, train)), set(map(str, val)), set(map(str, test))
        assert train and val and test
        assert not (train & test) and not (val & test) and not (train & val)


def test_test_wsis_filter_round_trip(imported):
    out, _ = imported
    tw = splits_mod.load_test_wsis(str(out / "splits" / "test_wsis.pkl"))
    cancer = sorted(tw)[0]
    split = sorted(tw[cancer])[0]
    ids = list(map(str, tw[cancer][split]))
    assert ids
    df = pd.DataFrame({"wsi_file_name": ids[:3] + ["NOT-A-WSI"],
                       "patient_id": ["p"] * (min(3, len(ids)) + 1)})
    kept = splits_mod.filter_by_test_wsis(df, tw, cancer, split)
    assert set(kept["wsi_file_name"]) == set(ids[:3])


def test_fold_arrays_are_wsi_id_strings(imported):
    out, _ = imported
    path = out / "splits" / "folds" / "test-brca-0.npy"
    arr = np.load(str(path), allow_pickle=True)
    assert arr.ndim == 1 and len(arr) > 0
    assert all(isinstance(str(x), str) and len(str(x)) > 5 for x in arr[:5])


def test_gene_list_matches_ref_file_columns(imported):
    out, _ = imported
    genes = pd.read_csv(out / "examples" / "gene_list.csv").iloc[:, -1].tolist()
    ref = pd.read_csv(out / "examples" / "ref_file.csv", nrows=1)
    rna = [c.removeprefix("rna_") for c in ref.columns if c.startswith("rna_")]
    assert rna == genes
