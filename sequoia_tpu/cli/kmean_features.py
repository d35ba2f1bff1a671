"""Per-slide k-means cluster features (reference
``pre_processing/kmean_features.py`` CLI contract + ``--backend``)."""

from __future__ import annotations

import argparse

import pandas as pd

from sequoia_tpu.pipeline import kmeans_stage


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="K-means cluster features")
    p.add_argument("--ref_file", required=True, type=str)
    p.add_argument("--patch_data_path", type=str, default=None,
                   help="(accepted for compatibility; unused)")
    p.add_argument("--feature_path", type=str, default="features")
    p.add_argument("--num_clusters", type=int, default=100)
    p.add_argument("--feat_name", type=str, default="resnet_features")
    p.add_argument("--tcga_projects", default=None, type=str, nargs="*")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--gtex", action="store_true")
    p.add_argument("--gtex_tissue", type=str, default=None)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--backend", type=str, default="tpu",
                   choices=["tpu", "hybrid", "sklearn"])
    from sequoia_tpu.parallel import multihost
    multihost.add_fleet_args(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    df = pd.read_csv(args.ref_file)
    if args.tcga_projects:
        df = df[df["tcga_project"].isin(args.tcga_projects)]
    df = df.iloc[args.start:args.end]
    from sequoia_tpu.parallel import multihost
    df = multihost.fleet_shard_rows(df, args)
    print(f"Number of slides = {df.shape[0]}")

    # The reference hardcodes KMeans(random_state=0) regardless of --seed
    # (kmean_features.py KMeans call); keep that contract.
    done = kmeans_stage.run_kmeans(
        df, args.feature_path, num_clusters=args.num_clusters,
        feat_name=args.feat_name, seed=0, backend=args.backend,
        gtex_tissue=args.gtex_tissue if args.gtex else None)
    print(f"Clustered {done} slides. Done!")


if __name__ == "__main__":
    main()
