"""Spatial expression-map CLI (reference ``spatial_vis/visualize.py``
contract: same flags, writes ``stride-{stride}.csv``).

Project layouts (TCGA / spatial_GBM_pred / Breast-ST) follow the reference's
path conventions rooted at ``--data_root``; the magnification overrides
(spot-diameter um/px for spatial GBM, metadata magnification for Breast-ST)
are reproduced.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np
import pandas as pd

from sequoia_tpu.cli.compute_features import load_extractor
from sequoia_tpu.data.wsi import open_slide
from sequoia_tpu.models import convert
from sequoia_tpu.pipeline import spatial
from sequoia_tpu.train import checkpoint


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Spatial gene-expression maps")
    p.add_argument("--study", type=str, required=True)
    p.add_argument("--project", type=str, required=True)
    p.add_argument("--gene_names", type=str, default="all",
                   help='comma-separated genes, a .npy of names, or "all"')
    p.add_argument("--wsi_file_name", type=str, required=True)
    p.add_argument("--save_folder", type=str, required=True)
    p.add_argument("--model_type", type=str, required=True,
                   choices=["he2rna", "vit", "vis"])
    p.add_argument("--feat_type", type=str, required=True,
                   choices=["resnet", "uni"])
    p.add_argument("--folds", type=str, default="0,1,2,3,4")
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--data_root", type=str, default=".")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="default {model_type}_{feat_type}/{study}/")
    p.add_argument("--weights", type=str, required=True,
                   help="backbone weights (.pt/.bin) or 'random'")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--accumulate", type=str, default="auto",
                   choices=["auto", "host", "device"],
                   help="overlap-averaging sums: host float64 (reference-"
                        "faithful) or fully device-resident f32 (one table "
                        "upload, jitted gather/scatter; ~1e-5 rel. diff); "
                        "auto = device for stacked vis folds at >=1024 genes")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard tile featurization AND the window stage "
                        "over all local chips (('data','model') mesh, "
                        "model=1); vis folds only, implies device "
                        "accumulation")
    return p


def resolve_paths(args):
    """Reference path conventions per project kind -> (slide_path, mask,
    manual_resize)."""
    root = args.data_root
    wsi = args.wsi_file_name
    if "TCGA" in wsi:
        slide_path = os.path.join(root, "TCGA", args.project, wsi)
        mask = np.load(os.path.join(root, "TCGA", args.project + "_Masks",
                                    wsi.replace(".svs", ""), "mask.npy"))
        return slide_path, mask, None
    if args.project == "spatial_GBM_pred":
        slide_path = os.path.join(root, "Spatial_GBM", "pyramid", wsi)
        mask = np.load(os.path.join(root, "Spatial_GBM", "masks",
                                    wsi.replace(".tif", ".npy")))
        px_df = pd.read_csv(os.path.join(root, "Spatial_Heiland", "data",
                                         "classify", "spot_diameter.csv"))
        diam = px_df[px_df["slide_id"] == wsi.split("_")[1] + "_T"][
            "pixel_diameter"].values[0]
        um_px = 55 / diam
        return slide_path, mask, 0.5 / um_px
    if args.project == "Breast-ST":
        slide_path = os.path.join(root, "Breast-ST", "wsis", wsi)
        mask = np.load(os.path.join(root, "Breast-ST", "masks",
                                    wsi.replace(".tif", ".npy")))
        meta = json.load(open(os.path.join(root, "Breast-ST", "metadata",
                                           wsi.replace(".tif", ".json"))))
        mag = float(str(meta["magnification"]).replace("x", ""))
        return slide_path, mask, mag / 20.0
    raise SystemExit("unknown project layout; expected TCGA wsi name, "
                     "spatial_GBM_pred, or Breast-ST")


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    ckpt_dir = args.checkpoint_dir or f"{args.model_type}_{args.feat_type}/{args.study}/"

    with open(os.path.join(ckpt_dir, "test_results.pkl"), "rb") as f:
        gene_ids = pickle.load(f)["genes"]

    if args.gene_names == "all":
        gene_names = gene_ids
    elif args.gene_names.endswith(".npy"):
        gene_names = [str(g) for g in np.load(args.gene_names, allow_pickle=True)]
    else:
        gene_names = args.gene_names.split(",")

    slide_path, mask, manual_resize = resolve_paths(args)
    slide = open_slide(slide_path)
    extractor = load_extractor(args.feat_type, args.weights, args.batch_size,
                               data_parallel=args.data_parallel)
    mesh = extractor.mesh if args.data_parallel else None
    if mesh is not None and args.model_type != "vis":
        raise SystemExit("--data_parallel window sharding needs vis fold "
                         "checkpoints (the stacked predictor)")
    if mesh is not None and args.accumulate == "host":
        # refuse rather than silently switching the user's explicit
        # reference-faithful float64 host accumulation to device f32
        raise SystemExit("--data_parallel requires device accumulation; "
                         "drop --accumulate host (or --data_parallel)")

    folds = [int(i) for i in args.folds.split(",")]
    fold_models = {}
    vis_cfg, vis_fold_params = None, {}
    for fold in folds:
        ckpt = os.path.join(ckpt_dir, f"model_best_{fold}.pt")
        if fold == 0 and args.model_type in ("vit", "vis") \
                and not os.path.exists(ckpt):
            ckpt = os.path.join(ckpt_dir, "model_best.pt")
        if args.model_type == "he2rna":
            # rewrite only the basename (he2rna CV saves model_{i}.pt) — a
            # checkpoint_dir containing 'best_' must not be mangled
            d_, b_ = os.path.split(ckpt)
            ckpt = os.path.join(d_, b_.replace("best_", ""))
        sd = checkpoint.load_torch_checkpoint(ckpt)
        if args.model_type == "vis":
            cfg, params = convert.vis_from_torch(sd)
            if vis_cfg in (None, cfg):
                vis_cfg, vis_fold_params[fold] = cfg, params
            fold_models[fold] = spatial.make_vis_predict_fn(cfg, params)
        elif args.model_type == "vit":
            cfg, params = convert.vit_from_torch(sd)
            from sequoia_tpu.models import vit as vit_mod
            import jax, jax.numpy as jnp

            fwd = jax.jit(lambda p, x, c=cfg: vit_mod.apply(c, p, x))
            # bind fwd as a default too: a closure capture would late-bind
            # every fold's predictor to the LAST fold's jitted forward/cfg
            fold_models[fold] = (
                lambda f, pr=params, fw=fwd: fw(pr, jnp.asarray(f)))
        else:
            cfg, params = convert.he2rna_from_torch(sd)
            fold_models[fold] = spatial.make_he2rna_predict_fn(cfg, params)

    if args.model_type == "vis" and len(vis_fold_params) == len(folds):
        # all folds share one architecture: one vmapped forward per batch
        fold_models = spatial.make_vis_stacked_predict_fn(vis_cfg,
                                                          vis_fold_params,
                                                          mesh=mesh)
    elif mesh is not None:
        raise SystemExit("--data_parallel needs homogeneous vis folds")

    save_path = os.path.join("visualizations", args.project, args.save_folder,
                             args.wsi_file_name)
    # the reference resizes EVERY tile before the backbone: Resize(224) for
    # uni, Resize((256,265)) for resnet (the 265 is its waived typo —
    # PARITY_NOTES — intent is the square patch size).  Without this, a
    # non-20x slide would feed mag-sized tiles to a 256px-compiled
    # extractor: crash at 40x, silently-wrong features below 20x.
    resize_to = 224 if args.feat_type == "uni" else args.patch_size
    # windows pad/truncate to the MODEL's token budget (the reference
    # hard-codes 100 because its checkpoints are always 100-token)
    num_tokens = vis_cfg.num_clusters if vis_cfg is not None else \
        getattr(cfg, "num_clusters", 100)
    spatial.run_visualize(slide, mask, list(gene_ids), fold_models, extractor,
                          gene_names=gene_names, patch_size=args.patch_size,
                          resize_factor=manual_resize, stride=args.stride,
                          save_path=save_path, resize_patch_to=resize_to,
                          accumulate="device" if mesh is not None
                          else args.accumulate,
                          num_tokens=num_tokens, mesh=mesh)
    print("Done")


if __name__ == "__main__":
    main()
