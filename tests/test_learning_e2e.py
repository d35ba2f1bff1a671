"""Scientific end-to-end: planted expression signal -> ViS training ->
significance pipeline recovers exactly the signal genes.

This is the rebuild's analogue of the reference's de-facto correctness
oracle (SURVEY.md section 4): the trained model must beat the untrained
null on predictable genes and not on noise genes, as judged by the full
Pearson + Steiger + FDR gate.
"""

import pytest
import os

import h5py
import numpy as np
import pandas as pd

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.evaluation import evaluate_model as em
from sequoia_tpu.train import cv


def make_signal_store(root, n_slides=40, dim=12, tokens=100, n_signal=4,
                      n_noise=4, seed=0):
    """rna_S* = linear readout of the slide's mean cluster feature (+noise);
    rna_N* = pure noise."""
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(dim, n_signal))
    rows = []
    for i in range(n_slides):
        wsi = f"slide_{i:03d}"
        d = os.path.join(root, "TCGA-SIG", wsi)
        os.makedirs(d, exist_ok=True)
        feats = rng.normal(size=(tokens, dim)).astype(np.float32)
        feats += rng.normal(size=(1, dim)).astype(np.float32)  # slide identity
        with h5py.File(os.path.join(d, wsi + ".h5"), "w") as f:
            f.create_dataset("cluster_features", data=feats)
        signal = feats.mean(axis=0) @ W + 0.05 * rng.normal(size=n_signal)
        row = {"wsi_file_name": wsi, "patient_id": f"P{i}",
               "tcga_project": "TCGA-SIG"}
        for g in range(n_signal):
            row[f"rna_S{g}"] = float(signal[g])
        for g in range(n_noise):
            row[f"rna_N{g}"] = float(rng.normal())
        rows.append(row)
    return pd.DataFrame(rows)


@pytest.mark.slow
def test_signal_genes_become_significant(tmp_path):
    store = tmp_path / "features"
    df = make_signal_store(str(store))

    out = cv.run_cross_validation(
        df, str(store), str(tmp_path / "exp"), model_type="vis", depth=1,
        num_heads=2, k=3, batch_size=8, num_epochs=60, lr=1e-3,
        save_on="loss", stop_on="loss", verbose=False)

    res = em.evaluate_split_results(out)
    sig = em.significant_genes(res)
    signal_genes = {f"S{g}" for g in range(4)}
    noise_genes = {f"N{g}" for g in range(4)}
    assert signal_genes <= set(sig.index), (
        f"missed signal genes: {signal_genes - set(sig.index)};\n{res}")
    assert not (noise_genes & set(sig.index)), (
        f"false positives: {noise_genes & set(sig.index)}")
    # signal genes should correlate strongly, noise genes shouldn't
    assert res.loc[list(signal_genes), "pred_real_r"].min() > 0.5
    assert res.loc[list(noise_genes), "pred_real_r"].abs().max() < 0.5
