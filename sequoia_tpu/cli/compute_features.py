"""Batched backbone feature extraction (reference
``pre_processing/compute_features_hdf5.py`` CLI contract + TPU options).

The reference loads ImageNet ResNet-50 weights from the torchvision model
zoo and UNI weights from a local ``pytorch_model.bin``; in zero-egress
environments pass them via ``--weights`` (a torch state-dict ``.pt``/``.bin``
or safetensors file).  ``--weights random`` runs a randomly initialized
backbone (benchmarks, smoke tests).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import pandas as pd

from sequoia_tpu.models import resnet, uni_vit
from sequoia_tpu.pipeline import features as feat_stage
from sequoia_tpu.train import checkpoint


def load_extractor(feat_type: str, weights: str, batch_size: int,
                   compute_dtype: str = "float32",
                   data_parallel: bool = False) -> feat_stage.FeatureExtractor:
    import dataclasses

    mesh = None
    if data_parallel:
        from sequoia_tpu.parallel import sharding as sh

        # local devices only: under --multihost jax.devices() is the fleet-
        # global list and device_put to non-addressable devices would fail
        local = jax.local_devices()
        mesh = sh.make_mesh(n_data=len(local), n_model=1, devices=local)

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    cfg = None
    if feat_type == "resnet":
        if weights == "random":
            params = resnet.random_params(jax.random.PRNGKey(0))
        else:
            sd = checkpoint.load_torch_checkpoint(weights)
            params = resnet.resnet50_from_torch(sd)
    elif feat_type == "uni":
        if weights == "random":
            params = uni_vit.random_params(uni_vit.UniViTConfig(),
                                           jax.random.PRNGKey(0))
        else:
            sd = checkpoint.load_torch_checkpoint(weights)
            # keep the cfg inferred from the state dict (the released UNI
            # weights match the default, but non-ViT-L dicts must not be
            # silently forced into the default shape)
            cfg, params = uni_vit.uni_from_torch(sd)
            cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    else:
        raise ValueError('feat_type must be "resnet" or "uni"')
    return feat_stage.FeatureExtractor(feat_type, params, batch_size=batch_size,
                                       compute_dtype=dtype, cfg=cfg, mesh=mesh)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Per-patch feature extraction")
    p.add_argument("--feat_type", default="resnet", choices=["resnet", "uni"])
    p.add_argument("--ref_file", required=True, type=str)
    p.add_argument("--patch_data_path", required=True, type=str)
    p.add_argument("--feature_path", type=str, default="features")
    p.add_argument("--max_patch_number", type=int, default=4000)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--tcga_projects", default=None, type=str, nargs="*")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--weights", type=str, required=True,
                   help='torch state-dict path, or "random"')
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--data_parallel", action="store_true",
                   help="shard patch batches over all local devices "
                        "(ICI data parallelism; batch_size must divide "
                        "evenly by the device count)")
    from sequoia_tpu.cli import add_compile_cache_arg
    add_compile_cache_arg(p)
    from sequoia_tpu.parallel import multihost
    multihost.add_fleet_args(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from sequoia_tpu.cli import apply_compile_cache
    apply_compile_cache(args)
    df = pd.read_csv(args.ref_file)
    if args.tcga_projects:
        df = df[df["tcga_project"].isin(args.tcga_projects)]
    df = df.iloc[args.start:args.end]
    from sequoia_tpu.parallel import multihost
    df = multihost.fleet_shard_rows(df, args)
    print(f"Number of slides = {df.shape[0]}")

    extractor = load_extractor(args.feat_type, args.weights, args.batch_size,
                               args.compute_dtype,
                               data_parallel=args.data_parallel)
    done = feat_stage.compute_features(
        df, args.patch_data_path, args.feature_path, extractor,
        max_patch_number=args.max_patch_number, seed=args.seed)
    print(f"Extracted features for {done} slides")


if __name__ == "__main__":
    main()
