"""Convert checkpoints between torch (reference) and sequoia-tpu formats.

Examples:
    # released HF fold weights (local snapshot dir or .pt/.bin) -> orbax
    python tools/convert_weights.py --model vis --src sequoia-brca-0/ \
        --dst ckpt_brca0_orbax --to orbax

    # our orbax/train-state -> reference-loadable torch .pt
    python tools/convert_weights.py --model vis --src ckpt_brca0_orbax \
        --dst model_best_0.pt --to torch
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sequoia_tpu.models import convert  # noqa: E402
from sequoia_tpu.train import checkpoint  # noqa: E402

FROM_TORCH = {"vis": convert.vis_from_torch, "vit": convert.vit_from_torch,
              "he2rna": convert.he2rna_from_torch}
TO_TORCH = {"vis": convert.vis_to_torch, "vit": convert.vit_to_torch,
            "he2rna": convert.he2rna_to_torch}
CFG_FROM_SD = {"vis": convert.vis_config_from_state_dict,
               "vit": convert.vit_config_from_state_dict,
               "he2rna": convert.he2rna_config_from_state_dict}


def load_any(model: str, src: str):
    """-> (cfg, params) from torch .pt/.bin, HF snapshot dir, or orbax dir."""
    if os.path.isdir(src) and not (
            os.path.exists(os.path.join(src, "model.safetensors"))
            or os.path.exists(os.path.join(src, "pytorch_model.bin"))):
        raise SystemExit(
            "orbax -> torch needs the architecture: in Python use "
            "checkpoint.load_orbax(path, like=params) and "
            "models.convert.*_to_torch")
    if os.path.isdir(src):
        sd = checkpoint.load_hf_vis_state_dict(src)
    else:
        sd = checkpoint.load_torch_checkpoint(src)
    return FROM_TORCH[model](sd)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Checkpoint converter")
    p.add_argument("--model", required=True, choices=["vis", "vit", "he2rna"])
    p.add_argument("--src", required=True,
                   help="torch .pt/.bin, HF snapshot dir, or orbax dir")
    p.add_argument("--dst", required=True)
    p.add_argument("--to", required=True, choices=["torch", "orbax"])
    args = p.parse_args(argv)

    cfg, params = load_any(args.model, args.src)
    print(f"loaded {args.model}: {cfg}")
    if args.to == "torch":
        checkpoint.save_torch_state_dict(TO_TORCH[args.model](cfg, params),
                                         args.dst)
    else:
        checkpoint.save_orbax(args.dst, params)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
