"""Independent-cohort inference with the released 5-fold ViS weights
(reference ``evaluation/predict_independent_dataset.py``, shipped bugs fixed).

Loads ``gevaertlab/sequoia-{cancer}-{fold}`` checkpoints (HF repo id when the
hub is reachable, or local snapshot directories / ``.pt`` files for
zero-egress runs), predicts on the cohort, averages the folds, and pairs the
result with a fold-averaged untrained-model baseline.  Output:
``test_results.pkl`` = ``{'pred': DataFrame, 'random': DataFrame}`` indexed
by WSI, columns = genes.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
import pandas as pd

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.models import convert, vis
from sequoia_tpu.train import checkpoint, loop


def fold_checkpoint_source(template: str, fold: int) -> str:
    """``template`` may contain ``{fold}`` (local layout) or be an HF org
    prefix like ``gevaertlab/sequoia-brca`` (fold appended)."""
    if "{fold}" in template:
        return template.format(fold=fold)
    return f"{template}-{fold}"


def predict_independent(df: pd.DataFrame, feature_path: str, save_dir: str, *,
                        checkpoint_template: str, folds: int = 5,
                        feature_use: str = "cluster_features",
                        batch_size: int = 16, depth: int = 6,
                        num_heads: int = 16, seed: int = 99,
                        verbose: bool = True) -> dict:
    os.makedirs(save_dir, exist_ok=True)
    genes = ds.gene_names(df)

    test_ds = ds.FeatureDataset(df, feature_path, feature_use=feature_use)
    loader = ds.BatchLoader(test_ds, batch_size, shuffle=False)
    feature_dim = test_ds.feature_dim

    key = jax.random.PRNGKey(seed)
    res_preds, res_random = [], []
    wsis = None
    for fold in range(folds):
        src = fold_checkpoint_source(checkpoint_template, fold)
        if os.path.isfile(src):
            sd = checkpoint.load_torch_checkpoint(src)
        else:
            sd = checkpoint.load_hf_vis_state_dict(src)
        cfg, params = convert.vis_from_torch(sd)
        apply_fn = (lambda c: (lambda p, x: vis.apply(c, p, x)))(cfg)
        preds, wsis, _ = loop.predict(apply_fn, params, loader)

        key, krand = jax.random.split(key)
        rand_cfg = vis.ViSConfig(num_outputs=test_ds.num_genes,
                                 input_dim=feature_dim, depth=depth,
                                 nheads=num_heads, dim_f=64, dim_s=64, dim_c=64)
        rand_params = vis.init(rand_cfg, krand)
        rand_apply = (lambda c: (lambda p, x: vis.apply(c, p, x)))(rand_cfg)
        random_preds, _, _ = loop.predict(rand_apply, rand_params, loader)

        res_preds.append(preds)
        res_random.append(random_preds)
        if verbose:
            print(f"fold {fold}: predicted {preds.shape[0]} slides from {src}")

    avg_preds = np.mean(res_preds, axis=0)
    avg_random = np.mean(res_random, axis=0)
    test_results = {
        "pred": pd.DataFrame(avg_preds, index=wsis, columns=genes),
        "random": pd.DataFrame(avg_random, index=wsis, columns=genes),
    }
    with open(os.path.join(save_dir, "test_results.pkl"), "wb") as f:
        pickle.dump(test_results, f, protocol=pickle.HIGHEST_PROTOCOL)
    return test_results
