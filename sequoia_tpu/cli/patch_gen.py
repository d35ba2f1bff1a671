"""Tile WSIs into patches HDF5 (reference ``pre_processing/patch_gen_hdf5.py``
CLI contract: same flags, same outputs, --start/--end row sharding,
--debug trims to 5 slides x 20 patches)."""

from __future__ import annotations

import argparse
import os

import pandas as pd

from sequoia_tpu.pipeline import patch_gen


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate patches from WSIs")
    p.add_argument("--ref_file", default=None, type=str,
                   help="only WSIs listed in this ref file are processed")
    p.add_argument("--wsi_path", default="examples/HE", type=str)
    p.add_argument("--patch_path", default="examples/Patches_hdf5", type=str)
    p.add_argument("--mask_path", default="examples/Patches_hdf5", type=str)
    p.add_argument("--patch_size", default=256, type=int)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--max_patches_per_slide", default=None, type=int)
    p.add_argument("--debug", default=0, type=int)
    p.add_argument("--layout", default="tiles", choices=["tiles", "packed"],
                   help="HDF5 layout: 'tiles' = reference tile-per-dataset "
                        "contract; 'packed' = one chunked (N,ps,ps,3) "
                        "dataset + coords (faster I/O, readers handle both)")
    p.add_argument("--parallel", default=1, type=int,
                   help="(accepted for compatibility; decode parallelism is "
                        "handled by the native reader when built)")
    from sequoia_tpu.parallel import multihost
    multihost.add_fleet_args(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    # sorted: --start/--end job arrays and --multihost shard by INDEX, so
    # the ordering must be deterministic across hosts/reruns (raw listdir
    # order is filesystem-dependent)
    slide_list = sorted(s for s in os.listdir(args.wsi_path)
                        if s.endswith(".svs") or s.endswith(".tiff"))

    if args.ref_file:
        ref = pd.read_csv(args.ref_file)
        names = set(ref["wsi_file_name"])
        # bare ids in the ref file match either slide extension
        wanted = names | {f"{s}.svs" for s in names} | {f"{s}.tiff" for s in names}
        slide_list = sorted(set(slide_list) & wanted)

    slide_list = slide_list[args.start:args.end]
    from sequoia_tpu.parallel import multihost
    slide_list = multihost.fleet_shard_rows(slide_list, args)
    if args.debug:
        slide_list = slide_list[:5]
        args.max_patches_per_slide = 20

    print(f"Found {len(slide_list)} slides")
    slides = {s.split(".")[0]: os.path.join(args.wsi_path, s) for s in slide_list}
    if len(slides) != len(slide_list):
        print(f"warning: {len(slide_list) - len(slides)} slide(s) share a "
              "first-dot stem with another file and were dropped "
              "(slide ids are the stem, reference patch_gen_hdf5 layout)")
    patch_gen.run_patch_gen(slides, args.patch_path, args.mask_path,
                            patch_size=args.patch_size,
                            max_patches_per_slide=args.max_patches_per_slide,
                            layout=args.layout)


if __name__ == "__main__":
    main()
