"""Serving-latency microbench: B=1 aggregator forward, full head vs panel.

Measures what a resident server pays per slide AFTER features/k-means —
the fold-ensembled aggregator forward — and how gene-panel head slicing
changes it (the (D, G) head read from HBM dominates at B=1, so a P-gene
panel should approach G/P on the read-bound part).

    python tools/bench_serving.py                 # defaults: ViS, G=20820
    python tools/bench_serving.py --panel 50 --folds 5 --device cpu

Prints ONE JSON line. Not part of the driver bench (bench.py owns the
headline); this is runnable evidence for the serving docs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"],
                    help="jax platform override (default: environment)")
    ap.add_argument("--genes", type=int, default=20820)
    ap.add_argument("--panel", type=int, default=50)
    ap.add_argument("--folds", type=int, default=1)
    ap.add_argument("--input_dim", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import numpy as np

    from sequoia_tpu.models import vis
    from sequoia_tpu.pipeline.features import FeatureExtractor
    from sequoia_tpu.serve import SlidePredictor
    from sequoia_tpu.models import resnet

    cfg = vis.ViSConfig(num_outputs=args.genes, input_dim=args.input_dim,
                        compute_dtype="bfloat16")
    models = [(cfg, vis.init(cfg, jax.random.PRNGKey(i)))
              for i in range(args.folds)]
    extractor = FeatureExtractor(
        "resnet", resnet.random_params(jax.random.PRNGKey(9)), batch_size=16)
    cf = np.random.default_rng(0).normal(
        size=(1, cfg.num_clusters, args.input_dim)).astype(np.float32)

    def time_predictor(ms):
        pred = SlidePredictor(extractor, ms)
        pred.predict_cluster_features(cf)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = pred.predict_cluster_features(cf)  # np.asarray inside syncs
        dt = (time.perf_counter() - t0) / args.reps
        return dt, out.shape

    full_s, full_shape = time_predictor(models)
    idx = list(range(args.panel))
    panel_s, panel_shape = time_predictor(
        [vis.slice_head(c, p, idx) for c, p in models])

    print(json.dumps({
        "metric": "vis_b1_latency_ms",
        "device": jax.devices()[0].platform,
        "folds": args.folds,
        "full_head": {"genes": full_shape[-1],
                      "ms": round(full_s * 1e3, 3)},
        "panel": {"genes": panel_shape[-1],
                  "ms": round(panel_s * 1e3, 3)},
        "speedup": round(full_s / panel_s, 2),
    }))


if __name__ == "__main__":
    main()
