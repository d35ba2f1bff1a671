"""5-fold patient cross-validation drivers (reference ``src/main.py`` and the
``src/he2rna.py`` __main__ CV, with the reference's shipped import/syntax
bugs fixed — see SURVEY.md section 7.5).

Output contract: ``test_results.pkl`` =
``{'split_{i}': {'real', 'preds', 'random', 'wsi_file_name', 'tcga_project'},
   'genes': [...]}`` (pickle HIGHEST protocol), consumed unchanged by the
evaluation layer.  Checkpoints: ``model_best_{i}.pt`` torch state dicts.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.data import splits as sp
from sequoia_tpu.models import convert, he2rna, vis, vit
from sequoia_tpu.train import checkpoint, he2rna_fit, loop


def build_model(model_type: str, num_outputs: int, feature_dim: int, key,
                depth: int = 6, num_heads: int = 16, num_clusters: int = 100,
                compute_dtype: str | None = None):
    """Reference ``main.py`` model factory (vis/vit) -> (cfg, params, apply_fn,
    to_torch, from_torch)."""
    if model_type == "vit":
        cfg = vit.ViTConfig(num_outputs=num_outputs, dim=feature_dim,
                            depth=depth, heads=num_heads, mlp_dim=2048,
                            dim_head=64, num_clusters=num_clusters,
                            compute_dtype=compute_dtype)
        params = vit.init(cfg, key)
        return cfg, params, (lambda c: (lambda p, x: vit.apply(c, p, x)))(cfg), \
            convert.vit_to_torch, convert.vit_from_torch
    if model_type == "vis":
        cfg = vis.ViSConfig(num_outputs=num_outputs, input_dim=feature_dim,
                            depth=depth, nheads=num_heads,
                            dim_f=64, dim_s=64, dim_c=64,
                            num_clusters=num_clusters,
                            compute_dtype=compute_dtype)
        params = vis.init(cfg, key)
        return cfg, params, (lambda c: (lambda p, x: vis.apply(c, p, x)))(cfg), \
            convert.vis_to_torch, convert.vis_from_torch
    raise ValueError('model_type must be "vit" or "vis"')


def run_cross_validation(
        df, feature_path: str, save_dir: str, *, model_type: str = "vis",
        depth: int = 6, num_heads: int = 16, k: int = 5, batch_size: int = 16,
        lr: float = 1e-3, num_epochs: int = 200, seed: int = 99,
        save_on: str = "loss", stop_on: str = "loss", do_train: bool = True,
        hf_export: bool = False,
        checkpoint_path: str | None = None, change_num_genes: int = 0,
        log_fn=None, verbose: bool = True, resume: bool = False,
        mesh=None, eval_on: str = "final",
        compute_dtype: str | None = None,
        moment_dtype: str | None = None) -> dict:
    """Reference ``src/main.py`` flow: per-fold train -> test-fold eval ->
    random-model null -> ``test_results.pkl``.

    ``compute_dtype``: None (default) keeps the f32 parity path.
    "bfloat16" runs the aggregator blocks in bf16 (f32 LayerNorm/head/
    optimizer) AND casts feature batches to bf16 on host before upload —
    bit-identical to uploading f32 (the model casts its input first; both
    casts are round-to-nearest-even) at half the h2d bytes.

    ``moment_dtype``: store AdamW moments in this dtype (see
    ``loop.make_adamw``) — opt-in, non-parity, cuts optimizer HBM traffic.

    ``eval_on``: which trained weights produce ``test_results.pkl``.
    ``"final"`` (default) matches the reference exactly — its ``train``
    returns the live module at the last epoch and ``main.py:193`` evaluates
    that, while the best-val weights only go to ``model_best_{i}.pt``.
    ``"best"`` evaluates the saved-best weights instead.
    """
    if hf_export and model_type != "vis":
        raise ValueError(
            "hf_export supports model_type='vis' here (the reference's ViT "
            "has no hub mixin); HE2RNA exports via "
            "run_he2rna_cross_validation(hf_export=True)")
    os.makedirs(save_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)

    train_idxs, val_idxs, test_idxs = sp.patient_kfold(
        df["patient_id"].to_numpy(), n_splits=k)

    test_results_splits: dict = {}
    for i, (train_idx, val_idx, test_idx) in enumerate(
            zip(train_idxs, val_idxs, test_idxs)):
        train_df, val_df, test_df = (df.iloc[train_idx], df.iloc[val_idx],
                                     df.iloc[test_idx])
        for name, part in (("train", train_df), ("val", val_df), ("test", test_df)):
            np.save(os.path.join(save_dir, f"{name}_{i}.npy"),
                    np.unique(part["patient_id"]))

        train_ds = ds.FeatureDataset(train_df, feature_path)
        val_ds = ds.FeatureDataset(val_df, feature_path)
        test_ds = ds.FeatureDataset(test_df, feature_path)
        num_outputs, feature_dim = train_ds.num_genes, train_ds.feature_dim

        num_clusters = getattr(train_ds, "num_tokens", None) or 100

        key, kinit, krand, khead = jax.random.split(key, 4)
        if checkpoint_path and change_num_genes:
            # GTEx->TCGA: build at the pretraining width, load, swap head.
            cfg, params, apply_fn, to_torch, from_torch = build_model(
                model_type, change_num_genes, feature_dim, kinit, depth,
                num_heads, num_clusters, compute_dtype)
            sd = checkpoint.load_torch_checkpoint(checkpoint_path)
            cfg, params = from_torch(sd, cfg)
            if model_type == "vis":
                cfg, params = vis.replace_head(cfg, params, num_outputs, khead)
                apply_fn = (lambda c: (lambda p, x: vis.apply(c, p, x)))(cfg)
            else:
                cfg, params = vit.replace_head(cfg, params, num_outputs, khead)
                apply_fn = (lambda c: (lambda p, x: vit.apply(c, p, x)))(cfg)
        else:
            cfg, params, apply_fn, to_torch, from_torch = build_model(
                model_type, num_outputs, feature_dim, kinit, depth, num_heads,
                num_clusters, compute_dtype)
            if checkpoint_path:
                # our CV writes model_best_{i}.pt for every fold; the
                # reference writes model_best.pt for fold 0 (its falsy
                # `if split:` at vit.py:124-127) — accept both layouts so
                # continued training works against either producer
                candidates = [f"model_best_{i}.pt"]
                if i == 0:
                    candidates.append("model_best.pt")
                for name in candidates:
                    path = os.path.join(checkpoint_path, name)
                    if os.path.exists(path):
                        break
                else:
                    raise FileNotFoundError(
                        f"no {' / '.join(candidates)} under "
                        f"{checkpoint_path}")
                sd = checkpoint.load_torch_checkpoint(path)
                cfg, params = from_torch(sd, cfg)

        loaders = {
            "train": ds.BatchLoader(train_ds, batch_size, shuffle=True, seed=seed),
            "val": ds.BatchLoader(val_ds, batch_size, shuffle=False),
        }
        save_path = os.path.join(save_dir, f"model_best_{i}.pt")

        if do_train:
            result = loop.train(
                apply_fn, params,
                loop.make_adamw(lr, moment_dtype=moment_dtype), loaders,
                num_epochs=num_epochs, patience=20, delta=0.5,
                save_on=save_on, stop_on=stop_on, verbose=verbose,
                log_fn=log_fn,
                state_path=(os.path.join(save_dir, f"train_state_{i}.npz")
                            if resume else None),
                mesh=mesh, h2d_dtype=compute_dtype,
                save_fn=lambda p: checkpoint.save_torch_state_dict(
                    to_torch(cfg, p), save_path))
            params = (result.final_params if eval_on == "final"
                      else result.params)

        if hf_export and model_type == "vis":
            # publishing layout: the reference's ViS.from_pretrained (and
            # huggingface-cli upload) consume this directory as-is.  Publish
            # the BEST-val weights (model_best_{i}.pt) — the reference's
            # released checkpoints are the best-val selection, which under
            # the default eval_on='final' differ from the in-memory params.
            if os.path.exists(save_path):
                _, best_params = from_torch(
                    checkpoint.load_torch_checkpoint(save_path), cfg)
            elif do_train:
                raise FileNotFoundError(
                    f"hf_export: {save_path} missing after training — "
                    "nothing to publish")
            else:
                best_params = params  # inference-only run: loaded weights
            checkpoint.save_hf_vis_layout(
                os.path.join(save_dir, f"hf_fold_{i}"), cfg, best_params)

        test_loader = ds.BatchLoader(test_ds, batch_size, shuffle=False)
        preds, real, wsis, projs = loop.evaluate(apply_fn, params, test_loader,
                                                 verbose=verbose)

        # Untrained-model significance null (reference main.py:194-204).
        _, rand_params, rand_apply, _, _ = build_model(
            model_type, num_outputs, feature_dim, krand, depth, num_heads,
            num_clusters, compute_dtype)
        random_preds, _, _, _ = loop.evaluate(rand_apply, rand_params,
                                              test_loader, verbose=verbose)

        test_results_splits[f"split_{i}"] = {
            "real": real, "preds": preds, "random": random_preds,
            "wsi_file_name": wsis, "tcga_project": projs,
        }

    test_results_splits["genes"] = ds.gene_names(df)
    with open(os.path.join(save_dir, "test_results.pkl"), "wb") as f:
        pickle.dump(test_results_splits, f, protocol=pickle.HIGHEST_PROTOCOL)
    return test_results_splits


def run_he2rna_cross_validation(
        df, feature_path: str, save_dir: str, *, k: int = 5,
        batch_size: int = 16, lr: float = 1e-3, max_epochs: int = 200,
        seed: int = 99, checkpoint_path: str | None = None,
        change_num_genes: bool = False, num_genes: int | None = None,
        log_fn=None, verbose: bool = True, hf_export: bool = False) -> dict:
    """Reference ``src/he2rna.py`` __main__ CV flow."""
    os.makedirs(save_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)

    train_idxs, val_idxs, test_idxs = sp.patient_kfold(
        df["patient_id"].to_numpy(), n_splits=k)

    test_results_splits: dict = {}
    for i, (train_idx, val_idx, test_idx) in enumerate(
            zip(train_idxs, val_idxs, test_idxs)):
        train_ds = ds.FeatureDataset(df.iloc[train_idx], feature_path)
        val_ds = ds.FeatureDataset(df.iloc[val_idx], feature_path)
        test_ds = ds.FeatureDataset(df.iloc[test_idx], feature_path)

        key, kinit, khead = jax.random.split(key, 3)
        out_dim = num_genes if change_num_genes and num_genes else train_ds.num_genes
        cfg = he2rna.HE2RNAConfig(
            input_dim=train_ds.feature_dim, output_dim=out_dim,
            layers=(256, 256),
            ks=he2rna.ks_for_tokens(getattr(train_ds, "num_tokens", None)))
        params = he2rna.init(cfg, kinit)
        if checkpoint_path:
            sd = checkpoint.load_torch_checkpoint(checkpoint_path)
            # infer the architecture FROM the state dict (the local cfg's
            # hard-coded layers/output width may disagree with the loaded
            # checkpoint, surfacing later as an opaque shape error); the
            # config default supplies the reference ks sweep
            cfg, params = convert.he2rna_from_torch(sd)
        if change_num_genes:
            cfg, params = he2rna.replace_head(cfg, params, train_ds.num_genes, khead)

        test_loader = ds.BatchLoader(test_ds, batch_size, shuffle=False)
        # Pre-fit random-model null (reference he2rna.py:411).
        preds_random, labels_random, _, _ = he2rna_fit.he2rna_predict(
            cfg, params, test_loader)

        save_path = os.path.join(save_dir, f"model_{i}.pt")
        preds, labels, wsis, projs = he2rna_fit.fit(
            cfg, params, lr,
            ds.BatchLoader(train_ds, batch_size, shuffle=True, seed=seed),
            ds.BatchLoader(val_ds, batch_size, shuffle=False),
            test_loader, max_epochs=max_epochs, patience=100, seed=seed,
            log_fn=log_fn, verbose=verbose,
            save_fn=lambda p: checkpoint.save_torch_state_dict(
                convert.he2rna_to_torch(cfg, p), save_path))
        if hf_export:
            if not os.path.exists(save_path):
                raise FileNotFoundError(
                    f"hf_export: {save_path} missing — fit() saved no best "
                    "state; refusing to publish untrained init weights")
            best = convert.he2rna_from_torch(
                checkpoint.load_torch_checkpoint(save_path))[1]
            checkpoint.save_hf_he2rna_layout(
                os.path.join(save_dir, f"hf_fold_{i}"), cfg, best)

        test_results_splits[f"split_{i}"] = {
            "real": labels, "preds": preds, "random": preds_random,
            "wsi_file_name": wsis, "tcga_project": projs,
        }

    test_results_splits["genes"] = ds.gene_names(df)
    with open(os.path.join(save_dir, "test_results.pkl"), "wb") as f:
        pickle.dump(test_results_splits, f, protocol=pickle.HIGHEST_PROTOCOL)
    return test_results_splits
