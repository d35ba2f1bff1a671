"""Per-gene offline evaluation -> all/sig/num CSVs (reference
``evaluation/evaluate_model.py`` made a proper CLI)."""

from __future__ import annotations

import argparse

from sequoia_tpu.evaluation import evaluate_model as em


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate test_results.pkl files")
    p.add_argument("--model_dir", type=str, required=True,
                   help="directory holding {cancer}/test_results.pkl")
    p.add_argument("--cancers", type=str, nargs="*",
                   default=list(em.DEFAULT_CANCERS))
    p.add_argument("--folds", type=int, default=None,
                   help="split count; default auto-detects per cancer")
    p.add_argument("--save_path", type=str, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    all_res, sig_res = em.evaluate_model_dir(
        args.model_dir, cancers=args.cancers, folds=args.folds,
        save_path=args.save_path)
    print(f"{len(all_res)} gene rows, {len(sig_res)} significant")
    print(sig_res["cancer"].value_counts())


if __name__ == "__main__":
    main()
