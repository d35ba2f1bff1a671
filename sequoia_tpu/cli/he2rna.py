"""HE2RNA baseline 5-fold CV (reference ``src/he2rna.py`` __main__ contract)."""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.train import cv
from sequoia_tpu.utils.logging import make_log_fn


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HE2RNA 5-fold CV")
    p.add_argument("--path_csv", type=str, required=True)
    p.add_argument("--feature_path", type=str, default="features/")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--change_num_genes", action="store_true")
    p.add_argument("--num_genes", type=int, default=None)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--num_workers", type=int, default=0,
                   help="(accepted for compatibility)")
    p.add_argument("--tcga_projects", default=None, type=str, nargs="*")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--subfolder", type=str, default="")
    p.add_argument("--destfolder", type=str, default="")
    p.add_argument("--hf_export", action="store_true",
                   help="also write per-fold PyTorchModelHubMixin layout "
                        "dirs (hf_fold_{i}/) for hub publishing")
    from sequoia_tpu.cli import add_compile_cache_arg
    add_compile_cache_arg(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from sequoia_tpu.cli import apply_compile_cache
    apply_compile_cache(args)
    np.random.seed(args.seed)
    save_dir = os.path.join(args.destfolder, args.subfolder, args.exp_name)
    os.makedirs(save_dir, exist_ok=True)
    log_fn, finish = make_log_fn(args.log, config=vars(args), name=args.exp_name)

    df = pd.read_csv(args.path_csv)
    if args.tcga_projects:
        df = df[df["tcga_project"].isin(args.tcga_projects)]
    df = ds.filter_no_features(df, args.feature_path, "cluster_features")

    cv.run_he2rna_cross_validation(
        df, args.feature_path, save_dir, k=args.k, batch_size=args.batch_size,
        lr=args.lr, seed=args.seed, checkpoint_path=args.checkpoint,
        change_num_genes=args.change_num_genes, num_genes=args.num_genes,
        log_fn=log_fn, hf_export=args.hf_export)
    finish()


if __name__ == "__main__":
    main()
