"""GTEx pretraining (reference ``src/pretrain_gtex.py`` CLI contract):
train-only phase, AdamW lr=3e-3 for vis/vit or Adam lr=3e-3 for he2rna,
date-stamped experiment names, ``--quick`` debug mode."""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import numpy as np
import pandas as pd

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.models import convert, he2rna
from sequoia_tpu.train import checkpoint, cv, he2rna_fit, loop
from sequoia_tpu.utils.logging import make_log_fn


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GTEx pretraining")
    p.add_argument("--save_dir", type=str, default="pretrained_model")
    p.add_argument("--path_csv", type=str, required=True)
    p.add_argument("--feature_path", type=str, default="features")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--log", type=str, default=None, help="wandb project")
    p.add_argument("--model", type=str, default="vis",
                   choices=["vis", "vit", "he2rna"])
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--num_epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_workers", type=int, default=8,
                   help="(accepted for compatibility)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--quick", type=int, default=0)
    from sequoia_tpu.cli import add_compile_cache_arg
    add_compile_cache_arg(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from sequoia_tpu.cli import apply_compile_cache
    apply_compile_cache(args)
    np.random.seed(args.seed)

    stamp = "{date:%Y-%m-%d}".format(date=datetime.datetime.now())
    args.exp_name = stamp if args.exp_name == "" else f"{stamp}_{args.exp_name}"
    save_dir = os.path.join(args.save_dir, args.exp_name)
    os.makedirs(save_dir, exist_ok=True)
    log_fn, finish = make_log_fn(args.log, config=vars(args), name=args.exp_name)

    df = pd.read_csv(args.path_csv)
    df = ds.filter_no_features(df, args.feature_path, "cluster_features")
    if args.quick:
        df = df.iloc[0:20, :]
        args.num_epochs = 5

    dataset = ds.FeatureDataset(df, args.feature_path)
    loader = ds.BatchLoader(dataset, args.batch_size, shuffle=True,
                            seed=args.seed)
    key = jax.random.PRNGKey(args.seed)

    if args.model in ("vis", "vit"):
        cfg, params, apply_fn, to_torch, from_torch = cv.build_model(
            args.model, dataset.num_genes, dataset.feature_dim, key,
            num_clusters=getattr(dataset, "num_tokens", None) or 100)
        if args.checkpoint:
            sd = checkpoint.load_torch_checkpoint(args.checkpoint)
            cfg, params = from_torch(sd, cfg)
        save_path = os.path.join(save_dir, "model_best.pt")
        loop.train(apply_fn, params, loop.make_adamw(3e-3),
                   {"train": loader}, num_epochs=args.num_epochs,
                   phases=("train",), log_fn=log_fn,
                   save_fn=lambda p: checkpoint.save_torch_state_dict(
                       to_torch(cfg, p), save_path))
    else:
        cfg = he2rna.HE2RNAConfig(
            input_dim=dataset.feature_dim, output_dim=dataset.num_genes,
            layers=(256, 256),
            ks=he2rna.ks_for_tokens(getattr(dataset, "num_tokens", None)))
        params = he2rna.init(cfg, key)
        if args.checkpoint:
            sd = checkpoint.load_torch_checkpoint(args.checkpoint)
            # infer the architecture from the state dict (a hard-coded cfg
            # could silently disagree with the loaded weights — same fix
            # as train/cv.py's he2rna branch)
            cfg, params = convert.he2rna_from_torch(sd)
        save_path = os.path.join(save_dir, "model.pt")
        he2rna_fit.fit(cfg, params, 3e-3, loader, None, None,
                       max_epochs=args.num_epochs, seed=args.seed,
                       log_fn=log_fn,
                       save_fn=lambda p: checkpoint.save_torch_state_dict(
                           convert.he2rna_to_torch(cfg, p), save_path))

    finish()
    print("Finished pre-training")


if __name__ == "__main__":
    main()
