"""Marginal per-stage cost of the ResNet-50 extraction path on TPU.

Two confounders make naive profiling useless here: (a) the sandbox TPU
relay adds ~4 ms fixed dispatch latency per executable, and (b) a stage
jitted in isolation compiles to different layouts/fusions than the same
stage inside the full program.  So this tool times CUMULATIVE PREFIXES of
the real program — preprocess..stem, preprocess..pool, ... — each scanned
``iters`` times inside one executable (input XOR-perturbed per iteration to
prevent loop hoisting), and reports successive differences: the marginal
cost of each stage as compiled in context.

Also times the full extractor under every fused_stages setting to give the
true end-to-end effect of the Pallas chain kernel per stage.

Usage: python -m tools.profile_backbone [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet


def build_prefix(cfg, params, upto: str):
    """upto in {'stem','pool','layer1'..'layer4','mean'}."""

    def fn(u8):
        x = resnet.preprocess_uint8(u8).astype(cfg.compute_dtype)
        x = jax.nn.relu(resnet._bn(
            resnet.stem_space_to_depth(x, params["conv1_s2d"]), params["bn1"]))
        if upto == "stem":
            return x
        x = jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
        if upto == "pool":
            return x
        for s in range(4):
            blocks = params[f"layer{s + 1}"]
            start = 0
            if s > 0:
                x = resnet._bottleneck(x, blocks[0], 2)
                start = 1
            if (s + 1) in cfg.fused_stages:
                x = resnet._fused_chain(x, blocks, start)
            else:
                for b in range(start, len(blocks)):
                    x = resnet._bottleneck(x, blocks[b], 1)
            if upto == f"layer{s + 1}":
                return x
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    return fn


def scanned_ms(fn, u8, iters, reps=3):
    @jax.jit
    def run(u8, c0):
        def step(c, _):
            y = fn(u8 ^ c)
            # fold the WHOLE output into the carry so nothing is dead code
            s = jnp.sum(y.astype(jnp.float32))
            return (s > 1e30).astype(jnp.uint8), None

        c, _ = jax.lax.scan(step, c0, None, length=iters)
        return c

    jax.block_until_ready(run(u8, jnp.uint8(0)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(u8, jnp.uint8(0)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused", default="", help="comma list, e.g. 1,2")
    ap.add_argument("--cp", default="", help="comma list for cp_stages")
    ap.add_argument("--early_pallas", action="store_true")
    args = ap.parse_args()
    B = args.batch
    cdtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    fused = tuple(int(s) for s in args.fused.split(",") if s)
    cp = tuple(int(s) for s in args.cp.split(",") if s)
    cfg = resnet.ResNetConfig(compute_dtype=cdtype, fused_stages=fused,
                              cp_stages=cp, early_pallas=args.early_pallas)
    params = resnet.random_params(jax.random.PRNGKey(0))
    u8 = jax.random.randint(jax.random.PRNGKey(2), (B, 256, 256, 3), 0, 256,
                            jnp.uint8)

    print(f"batch={B} dtype={cdtype.__name__} iters={args.iters} "
          f"fused={fused} cp={cp} early_pallas={args.early_pallas}")
    if not cp and not args.early_pallas:
        # cumulative-prefix marginals (XLA/fused paths only; the Pallas
        # configs are timed whole-model below — their stage boundaries do
        # not line up with prefix truncation points)
        prev = 0.0
        for upto in ("stem", "pool", "layer1", "layer2", "layer3", "layer4",
                     "mean"):
            ms = scanned_ms(build_prefix(cfg, params, upto), u8, args.iters)
            print(f"..{upto:8s} cum {ms:7.3f} ms   marginal {ms - prev:7.3f} ms")
            prev = ms

    full = scanned_ms(
        lambda v: resnet.extract_from_uint8(cfg, params, v), u8, args.iters)
    print(f"{'FULL':10s} {full:7.3f} ms  ({B / (full / 1e3):.0f} patches/s)")


if __name__ == "__main__":
    main()
