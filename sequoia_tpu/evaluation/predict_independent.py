"""Independent-cohort inference with the released 5-fold ViS weights
(reference ``evaluation/predict_independent_dataset.py:44-96``, shipped bugs fixed).

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
from sequoia_tpu.train import checkpoint


def fold_checkpoint_source(template: str, fold: int) -> str:
    """``template`` may contain ``{fold}`` (local layout) or be an HF org
    prefix like ``gevaertlab/sequoia-brca`` (fold appended)."""
    if "{fold}" in template:
        return template.format(fold=fold)
    return f"{template}-{fold}"


def ensemble_predict(cfg, fold_params_list, loader):
    """Fold-averaged predictions via one vmapped forward over stacked fold
    parameters.  Returns (mean_preds (n, G), wsis)."""
    import jax.numpy as jnp

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *fold_params_list)
    fwd = jax.jit(jax.vmap(lambda p, x: vis.apply(cfg, p, x),
                           in_axes=(0, None)))
    preds, wsis = [], []
    for batch in loader:
        if batch.n_valid == 0:
            continue
        p = np.asarray(fwd(stacked, jnp.asarray(batch.features)))  # (F, B, G)
        preds.append(p.mean(axis=0)[batch.valid])
        wsis.extend([w for w, v in zip(batch.wsi, batch.valid) if v])
    return (np.concatenate(preds) if preds else np.zeros((0, cfg.num_outputs)),
            np.asarray(wsis))


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

    # Load all folds, stack their parameter pytrees, and run the whole
    # ensemble as ONE vmapped forward per batch (the reference loops folds
    # over the dataset five times).
    cfg = None
    fold_params = []
    for fold in range(folds):
        src = fold_checkpoint_source(checkpoint_template, fold)
        if os.path.isfile(src):
            sd = checkpoint.load_torch_checkpoint(src)
        else:
            sd = checkpoint.load_hf_vis_state_dict(src)
        fcfg, params = convert.vis_from_torch(sd)
        if cfg is None:
            cfg = fcfg
        elif fcfg != cfg:
            raise ValueError(f"fold {fold} architecture differs: {fcfg} != {cfg}")
        fold_params.append(params)
        if verbose:
            print(f"fold {fold}: loaded {src}")

    # the significance null mirrors the ensemble's architecture (reference
    # predict_independent_dataset.py:75-80 re-uses the real ctor args) —
    # including its token count, which the loaded checkpoints dictate
    rand_cfg = vis.ViSConfig(num_outputs=test_ds.num_genes,
                             input_dim=feature_dim, depth=depth,
                             nheads=num_heads, dim_f=64, dim_s=64, dim_c=64,
                             num_clusters=cfg.num_clusters)
    key, *rkeys = jax.random.split(key, folds + 1)
    rand_params = [vis.init(rand_cfg, k) for k in rkeys]

    avg_preds, wsis = ensemble_predict(cfg, fold_params, loader)
    avg_random, _ = ensemble_predict(rand_cfg, rand_params, loader)
    test_results = {
        "pred": pd.DataFrame(avg_preds, index=wsis, columns=genes),
        "random": pd.DataFrame(avg_random, index=wsis, columns=genes),
    }
    with open(os.path.join(save_dir, "test_results.pkl"), "wb") as f:
        pickle.dump(test_results, f, protocol=pickle.HIGHEST_PROTOCOL)
    return test_results
