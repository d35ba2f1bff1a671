"""Generate synthetic example data in the reference's input schema.

Produces ``examples/ref_file.csv`` (``wsi_file_name, patient_id,
rna_{GENE}..., tcga_project`` — the reference's input contract),
``examples/gene_list.csv``, and optionally a ready-made feature store
(cluster_features h5 tree) plus synthetic pyramidal WSIs, so every stage of
the pipeline can be exercised without TCGA access.

Usage:
    python tools/make_example_data.py --out examples --n_slides 5 \
        --n_genes 200 [--features] [--wsis]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gene_names(n: int) -> list[str]:
    return [f"GENE{i:05d}" for i in range(n)]


def load_gene_list(path: str, n_genes: int = 0) -> list[str]:
    """Gene names from a gene_list.csv (``gene_name`` column, or the first
    column) — e.g. the REAL 20,820-gene list imported from the reference by
    ``tools/import_reference_artifacts.py``.  ``n_genes>0`` truncates."""
    df = pd.read_csv(path)
    col = "gene_name" if "gene_name" in df.columns else df.columns[0]
    genes = [str(g) for g in df[col]]
    return genes[:n_genes] if n_genes and n_genes > 0 else genes


def make_ref_file(out: str, n_slides: int, n_genes: int, project: str,
                  seed: int = 0, genes: list[str] | None = None) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    genes = genes if genes is not None else gene_names(n_genes)
    n_genes = len(genes)
    rows = []
    for i in range(n_slides):
        row = {
            "wsi_file_name": f"SYNTH-{project.split('-')[-1]}-{i:04d}.svs",
            "patient_id": f"SYNTH-PAT-{i // 2:04d}",
        }
        base = rng.normal(size=n_genes) * 2 + 8
        for g, v in zip(genes, base):
            row[f"rna_{g}"] = round(float(np.maximum(v, 0)), 4)
        row["tcga_project"] = project
        rows.append(row)
    df = pd.DataFrame(rows)
    os.makedirs(out, exist_ok=True)
    df.to_csv(os.path.join(out, "ref_file.csv"), index=False)
    pd.DataFrame({"gene_name": genes}).to_csv(
        os.path.join(out, "gene_list.csv"), index=False)
    return df


def make_feature_store(out: str, df: pd.DataFrame, dim: int = 2048,
                       tokens: int = 100, n_patches: int = 500,
                       seed: int = 0) -> None:
    import h5py

    from sequoia_tpu.data.dataset import slide_h5_path

    rng = np.random.default_rng(seed)
    for _, row in df.iterrows():
        # the loaders resolve stores through slide_h5_path (including its
        # GTEX .svs-retention quirk) — write where they will read
        path = slide_h5_path(os.path.join(out, "features"),
                             row["tcga_project"], row["wsi_file_name"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with h5py.File(path, "w") as f:
            f.create_dataset("resnet_features",
                             data=rng.normal(size=(n_patches, dim)).astype(np.float32))
            f.create_dataset("cluster_features",
                             data=rng.normal(size=(tokens, dim)).astype(np.float32))


def make_wsis(out: str, df: pd.DataFrame, seed: int = 0) -> None:
    from tests.test_pipeline_e2e import synthetic_wsi  # reuse the generator
    from sequoia_tpu import native

    os.makedirs(os.path.join(out, "HE"), exist_ok=True)
    for i, (_, row) in enumerate(df.iterrows()):
        slide = synthetic_wsi(seed=seed + i)
        stem = row["wsi_file_name"].replace(".svs", "")
        path = os.path.join(out, "HE", stem + ".tiff")
        if native.available():
            native.write_tiled_tiff(path, slide.levels, tile=(128, 128))
        else:
            from PIL import Image

            Image.fromarray(slide.levels[0]).save(
                path, save_all=True,
                append_images=[Image.fromarray(lv) for lv in slide.levels[1:]])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="examples")
    p.add_argument("--n_slides", type=int, default=5)
    p.add_argument("--n_genes", type=int, default=200)
    p.add_argument("--project", type=str, default="TCGA-SYNT")
    p.add_argument("--features", action="store_true",
                   help="also write a synthetic feature store")
    p.add_argument("--wsis", action="store_true",
                   help="also write synthetic pyramidal WSIs")
    p.add_argument("--feature_dim", type=int, default=2048)
    p.add_argument("--n_tokens", type=int, default=100,
                   help="cluster tokens per slide in the synthetic feature "
                        "store (the reference contract is 100)")
    p.add_argument("--gene_list", type=str, default=None,
                   help="use gene names from this CSV (e.g. the imported "
                        "real 20,820-gene list) instead of GENE##### "
                        "synthetics; --n_genes <= 0 keeps all of them")
    args = p.parse_args()

    genes = (load_gene_list(args.gene_list, args.n_genes)
             if args.gene_list else None)
    df = make_ref_file(args.out, args.n_slides, args.n_genes, args.project,
                       genes=genes)
    if args.features:
        make_feature_store(args.out, df, dim=args.feature_dim,
                           tokens=args.n_tokens)
    if args.wsis:
        make_wsis(args.out, df)
    n_rna = sum(c.startswith("rna_") for c in df.columns)
    print(f"wrote {args.out}/ref_file.csv ({len(df)} slides, {n_rna} genes)")
