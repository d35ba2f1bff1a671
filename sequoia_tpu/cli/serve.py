"""One-shot slide serving CLI: WSI file(s) -> gene-panel CSV.

The reference has no serving story (its stages are glued by files on
disk); this is the command-line face of :mod:`sequoia_tpu.serve` — tiling,
feature extraction, k-means, and the (fold-ensembled) ViS forward in one
process with all stages jitted and the decode thread overlapping device
compute (``SlidePredictor.predict_wsi``).

    python -m sequoia_tpu.cli.serve \
        --wsi slide1.svs slide2.svs \
        --checkpoints saved_exp/brca/exp_vis \
        --feat_type resnet --weights resnet50.pth \
        --gene_names examples/gene_list.csv --out predictions.csv

``--checkpoints`` accepts a CV output directory (``model_best_{i}.pt`` +
``test_results.pkl``, folds auto-discovered), a single ``.pt``, or an
HF-layout directory (``config.json`` + safetensors / bin).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
import pandas as pd

from sequoia_tpu.cli.compute_features import load_extractor
from sequoia_tpu.models import convert, vis
from sequoia_tpu.serve import SlidePredictor
from sequoia_tpu.train import checkpoint


def load_fold_models(path: str,
                     model_type: str = "vis") -> list[tuple[object, dict]]:
    """CV dir / single .pt / HF-layout dir -> [(cfg, params), ...]."""
    from_torch = {"vis": convert.vis_from_torch,
                  "vit": convert.vit_from_torch,
                  "he2rna": convert.he2rna_from_torch}[model_type]
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "config.json")):  # HF layout
            if model_type != "vis":
                raise SystemExit(
                    f"HF-layout loading is vis-only (got {model_type})")
            sd = checkpoint.load_hf_vis_state_dict(path)
            return [convert.vis_from_torch(sd)]
        # vis/vit CV dirs hold model_best_{i}.pt; he2rna CV holds
        # model_{i}.pt (reference he2rna.py whole-module saves)
        pts = (sorted(glob.glob(os.path.join(path, "model_best*.pt")))
               or sorted(glob.glob(os.path.join(path, "model_*.pt"))))
        if not pts:
            raise SystemExit(f"no model_best*.pt / model_*.pt under {path}")
        return [from_torch(checkpoint.load_torch_checkpoint(p))
                for p in pts]
    return [from_torch(checkpoint.load_torch_checkpoint(path))]


def read_gene_list_file(path: str) -> list[str]:
    """Gene-list file -> names: .npy array, .csv last column (WITH a header
    row, like ``examples/gene_list.csv``), or one-name-per-line text."""
    if path.endswith(".npy"):
        return [str(g) for g in np.load(path, allow_pickle=True)]
    if path.endswith(".csv"):
        df = pd.read_csv(path)
        return df[df.columns[-1]].astype(str).tolist()
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _gene_list_arg(arg: str, flag: str) -> list[str]:
    """Shared --gene_names/--panel value parsing: existing file, or a
    comma list; a file-looking value that doesn't exist errors loudly."""
    if os.path.exists(arg):
        return read_gene_list_file(arg)
    if arg.endswith((".csv", ".npy", ".txt")) or os.sep in arg:
        raise SystemExit(f"{flag} file not found: {arg}")
    return arg.split(",")  # sibling-CLI comma-list convention


def load_gene_names(arg: str | None, ckpt_path: str, n: int) -> list[str]:
    if arg:
        return _gene_list_arg(arg, "--gene_names")
    tr = os.path.join(ckpt_path, "test_results.pkl")
    if os.path.isdir(ckpt_path) and os.path.exists(tr):
        import pickle

        with open(tr, "rb") as f:
            return [str(g) for g in pickle.load(f)["genes"]]
    return [f"gene_{i}" for i in range(n)]


def resolve_panel(arg: str, genes: list[str]) -> tuple[list[int], list[str]]:
    """--panel value -> (head column indices, panel gene names)."""
    wanted = _gene_list_arg(arg, "--panel")
    pos = {g: i for i, g in enumerate(genes)}
    missing = [g for g in wanted if g not in pos]
    if missing:
        raise SystemExit(f"--panel genes not in the model's gene list: "
                         f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    if not wanted:
        raise SystemExit("--panel resolved to an empty gene list")
    return [pos[g] for g in wanted], wanted


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WSI -> gene panel serving")
    p.add_argument("--wsi", type=str, nargs="+", default=None,
                   help="slides for a one-shot run (omit with --http)")
    p.add_argument("--http", type=str, default=None, metavar="[HOST:]PORT",
                   help="stay resident and serve over HTTP instead of a "
                        "one-shot run: POST /predict {'wsi': path|[paths]}, "
                        "GET /genes, GET /healthz")
    p.add_argument("--http_max_pending", type=int, default=256,
                   help="backpressure cap on admitted-but-unfinished slides "
                        "under --http; past it POST /predict returns 429")
    p.add_argument("--http_timeout", type=float, default=None,
                   help="per-request wait bound in seconds under --http "
                        "(504 on expiry); default: wait forever")
    p.add_argument("--checkpoints", type=str, required=True,
                   help="CV dir, .pt file, or HF-layout dir")
    p.add_argument("--feat_type", default="resnet",
                   choices=["resnet", "uni"])
    p.add_argument("--model_type", default="vis",
                   choices=["vis", "vit", "he2rna"],
                   help="aggregator family the checkpoints belong to")
    p.add_argument("--weights", type=str, required=True,
                   help='backbone weights (.pt/.bin) or "random"')
    p.add_argument("--gene_names", type=str, default=None,
                   help="gene_list.csv / .npy; default: the checkpoint "
                        "dir's test_results.pkl")
    p.add_argument("--panel", type=str, default=None,
                   help="restrict output to a gene panel: comma list of "
                        "gene names, or a file (.csv last column WITH a "
                        "header row / .npy / one-per-line .txt); slices "
                        "the model head so serving reads only the panel's "
                        "head columns")
    p.add_argument("--out", type=str, default="predictions.csv")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--max_patches", type=int, default=4000)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--num_clusters", type=int, default=100)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard backbone patch batches over all local "
                        "devices (ICI data parallelism)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the one-shot run "
                        "into DIR (inspect with tensorboard/xprof)")
    from sequoia_tpu.cli import add_compile_cache_arg
    add_compile_cache_arg(p)
    from sequoia_tpu.parallel import multihost
    multihost.add_fleet_args(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if not args.wsi and not args.http:
        raise SystemExit("need --wsi (one-shot) or --http (resident server)")
    if args.wsi and args.http:
        raise SystemExit("--wsi and --http are mutually exclusive (the "
                         "resident server takes slides via POST /predict)")
    from sequoia_tpu.cli import apply_compile_cache
    apply_compile_cache(args)
    if args.multihost:
        # bulk scoring across a fleet: each process serves its deterministic
        # shard of the slide list and writes {out}.part{i}
        if args.http:
            raise SystemExit("--multihost shards one-shot bulk scoring; "
                             "run one --http server per host instead")
        import jax

        from sequoia_tpu.parallel import multihost

        args.wsi = list(multihost.fleet_shard_rows(args.wsi, args))
        root, ext = os.path.splitext(args.out)
        args.out = f"{root}.part{jax.process_index()}{ext}"
        if not args.wsi:
            print("[multihost] empty shard; nothing to do")
            return
    extractor = load_extractor(args.feat_type, args.weights, args.batch_size,
                               args.compute_dtype,
                               data_parallel=args.data_parallel)
    models = load_fold_models(args.checkpoints, args.model_type)

    def n_out(cfg):  # he2rna names the head width differently
        return getattr(cfg, "num_outputs", None) or cfg.output_dim

    genes = load_gene_names(args.gene_names, args.checkpoints,
                            n_out(models[0][0]))
    if len(genes) != n_out(models[0][0]):
        raise SystemExit(f"{len(genes)} gene names vs model head "
                         f"{n_out(models[0][0])}")

    if args.panel:
        from sequoia_tpu.models import he2rna as he_mod
        from sequoia_tpu.models import vit as vit_mod

        slicer = {"vis": vis.slice_head, "vit": vit_mod.slice_head,
                  "he2rna": he_mod.slice_head}[args.model_type]
        idx, genes = resolve_panel(args.panel, genes)
        models = [slicer(cfg, params, idx) for cfg, params in models]

    cfg0 = models[0][0]
    if (getattr(cfg0, "num_clusters", args.num_clusters) != args.num_clusters):
        # he2rna has no positional embedding -> any token count works
        raise SystemExit(
            f"--num_clusters {args.num_clusters} != checkpoint "
            f"num_clusters {cfg0.num_clusters} (inferred from pos_emb)")
    in_dim = getattr(cfg0, "input_dim", None) or cfg0.dim  # vit: tokens=dim
    if in_dim != extractor.feature_dim:
        raise SystemExit(
            f"--feat_type {args.feat_type} produces "
            f"{extractor.feature_dim}-d features but the checkpoint expects "
            f"input_dim {in_dim}")

    pred = SlidePredictor(extractor, models, model_type=args.model_type,
                          n_clusters=args.num_clusters,
                          max_patches=args.max_patches,
                          patch_size=args.patch_size)

    if args.http:
        from sequoia_tpu import http_serve

        if args.profile:
            print("--profile applies to one-shot runs only; ignored under "
                  "--http", file=sys.stderr)
        host, _, port = args.http.rpartition(":")
        try:
            port_n = int(port)
        except ValueError:
            raise SystemExit(f"--http expects [HOST:]PORT, got {args.http!r}")
        http_serve.run(
            http_serve.PredictorService(
                pred, genes, max_pending_slides=args.http_max_pending,
                request_timeout=args.http_timeout),
            host or "127.0.0.1", port_n)
        return

    if len(set(args.wsi)) != len(args.wsi):
        # a duplicated path would run the full pipeline twice and then
        # silently collapse to one CSV row
        print("serve: dropping duplicate --wsi paths", file=sys.stderr)
        args.wsi = list(dict.fromkeys(args.wsi))
    names = [os.path.basename(p) for p in args.wsi]
    if len(set(names)) != len(names):  # disambiguate duplicate basenames
        names = list(args.wsi)
    name_of = dict(zip(args.wsi, names))
    rows = {}
    failed = 0

    def quarantine(path, e):  # per-slide skip (reference behavior)
        nonlocal failed
        failed += 1
        print(f"{name_of[path]}: {e}", file=sys.stderr)

    from sequoia_tpu.utils.profiling import device_trace

    # cross-slide pipelining: slide i+1 decodes while slide i computes
    with device_trace(args.profile):
        for path, out in pred.predict_slides(args.wsi, on_error=quarantine):
            rows[name_of[path]] = out[0]
            print(f"{name_of[path]}: ok ({len(models)}-fold ensemble)")
    if rows:
        df = pd.DataFrame(rows, index=genes).T
        df.index.name = "wsi_file_name"
        df.to_csv(args.out)
        print(f"wrote {args.out} ({len(rows)} slides x {len(genes)} genes"
              + (f"; {failed} failed)" if failed else ")"))
    if not rows:
        raise SystemExit(f"all {failed} slides failed; nothing written")


if __name__ == "__main__":
    main()
