"""Reference-scale fixture: the FULL 20,820-gene panel end to end.

The reference ships ``examples/ref_file.csv`` with 20,823 columns
(``wsi_file_name, patient_id, rna_{GENE} x 20820, tcga_project`` —
reference ``README.md:48-52``, ``examples/gene_list.csv``).  This test
generates a synthetic workspace at that exact scale with
``tools/make_example_data`` and drives the schema-sensitive paths through
it: dataset probing, CV training with the full gene head, the
``test_results.pkl`` contract, and fold-ensemble serving — so the panel
width the released weights use is exercised, not just asserted.
"""

import os
import pickle
import sys

import numpy as np
import pandas as pd
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

N_GENES = 20820


@pytest.mark.slow
def test_full_panel_workspace_end_to_end(tmp_path):
    import make_example_data as med

    out = str(tmp_path)
    df = med.make_ref_file(out, n_slides=12, n_genes=N_GENES,
                           project="TCGA-SYNT")
    med.make_feature_store(out, df, dim=512, tokens=100, n_patches=120)

    # --- schema contract: 20,823 columns in the reference's order ----------
    ref = pd.read_csv(os.path.join(out, "ref_file.csv"))
    assert ref.shape == (12, N_GENES + 3)
    assert ref.columns[0] == "wsi_file_name"
    assert ref.columns[1] == "patient_id"
    assert ref.columns[-1] == "tcga_project"
    rna_cols = [c for c in ref.columns if c.startswith("rna_")]
    assert len(rna_cols) == N_GENES
    genes = pd.read_csv(os.path.join(out, "gene_list.csv"))
    assert len(genes) == N_GENES

    # --- dataset probes the full panel -------------------------------------
    from sequoia_tpu.data import dataset as ds

    feature_path = os.path.join(out, "features")
    data = ds.FeatureDataset(ref, feature_path)
    assert data.num_genes == N_GENES
    assert data.feature_dim == 512

    # --- CV training with the full 20,820-gene head ------------------------
    from sequoia_tpu.train import cv

    save_dir = str(tmp_path / "exp")
    results = cv.run_cross_validation(
        ref, feature_path, save_dir, model_type="vis", depth=1, num_heads=2,
        k=2, batch_size=4, lr=1e-3, num_epochs=1, seed=99, verbose=False)
    with open(os.path.join(save_dir, "test_results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert len(res["genes"]) == N_GENES
    for split in (0, 1):
        assert res[f"split_{split}"]["preds"].shape[1] == N_GENES
        assert np.isfinite(res[f"split_{split}"]["preds"]).all()

    # --- fold-ensemble serving at panel width -------------------------------
    from sequoia_tpu.models import convert
    from sequoia_tpu.serve import SlidePredictor
    from sequoia_tpu.train import checkpoint

    folds = []
    for i in (0, 1):
        sd = checkpoint.load_torch_checkpoint(
            os.path.join(save_dir, f"model_best_{i}.pt"))
        folds.append(convert.vis_from_torch(sd))
    pred = SlidePredictor.__new__(SlidePredictor)
    SlidePredictor.__init__(pred, extractor=None, vis_models=folds)
    import h5py

    wsi = ref.iloc[0]["wsi_file_name"].replace(".svs", "")
    with h5py.File(os.path.join(feature_path, "TCGA-SYNT", wsi,
                                wsi + ".h5")) as f:
        cf = f["cluster_features"][:]
    out_pred = pred.predict_cluster_features(cf)
    assert out_pred.shape == (1, N_GENES)
    assert np.isfinite(out_pred).all()
