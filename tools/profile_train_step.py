"""Per-piece roofline profile of the training plane (VERDICT r4 item 1).

Decomposes the two production train steps on the real chip:

* ViS (reference loop being beaten: ``src/vit.py:158-180``) at the
  production shape B=16, T=100 cluster tokens, D=2048, G=20,820 —
  forward, forward+backward, AdamW update alone, on-device metrics alone,
  and the full fused step, next to analytic FLOP/byte floors.
* HE2RNA (reference ``src/he2rna.py:108-127``): the train step PER FIXED k
  across the reference sweep ks=(1,2,5,10,20,50,100) plus the random-k
  step the real loop runs — the backward's exact one-hot contraction is
  O(B*G*k*T), so step cost varies ~50x with the sampled k and any single
  number is meaningless without stating its k distribution.

Prints one JSON dict; run on the TPU host:  python tools/profile_train_step.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

B, T, D, G = 16, 100, 2048, 20820
STEPS = 30
V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def timeit(fn, *args, steps=STEPS):
    """Median-of-3 timed loops; blocks on the last output each loop."""
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / steps)
    return float(np.median(best))


def timeit_carry(fn, carry, extra, steps=STEPS):
    """Like timeit but threads a (params, opt_state) carry like a real
    training loop (donation-friendly: fresh buffers each call)."""
    import jax

    carry = fn(*carry, *extra)[:2]
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(*carry, *extra)[:2]
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / steps


def tree_bytes(tree) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def profile_vis() -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from sequoia_tpu.models import vis
    from sequoia_tpu.ops import stats
    from sequoia_tpu.train import loop

    rng = np.random.default_rng(0)
    feats = jax.device_put(rng.normal(size=(B, T, D)).astype(np.float32))
    rna = jax.device_put(rng.normal(size=(B, G)).astype(np.float32))
    valid = jax.device_put(np.ones((B,), bool))

    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=6, nheads=16,
                        dim_f=64, dim_s=64, dim_c=64, num_clusters=T,
                        compute_dtype="bfloat16")
    params = vis.init(cfg, jax.random.PRNGKey(0))
    opt = loop.make_adamw(1e-3)
    opt_state = opt.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    out: dict = {"n_params_m": n_params / 1e6}

    # 1. forward only
    fwd = jax.jit(lambda p, x: vis.apply(cfg, p, x))
    out["fwd_ms"] = timeit(fwd, params, feats) * 1e3

    # 2. forward of the blocks alone (same math as vis.apply minus the
    # gene head: pos-emb + scanned blocks + token mean)
    def blocks_fwd(p, x):
        if cfg.compute_dtype is not None:
            x = x.astype(cfg.compute_dtype)
        x = x + p["pos_emb"].astype(x.dtype)
        x, _ = jax.lax.scan(lambda c, bp: (vis._block(cfg, c, bp), None),
                            x, p["blocks"])
        return jnp.mean(x.astype(jnp.float32), axis=1)

    out["blocks_fwd_ms"] = timeit(jax.jit(blocks_fwd), params, feats) * 1e3

    # 2b. gene head alone (LN + (B,D)x(D,G) GEMM) — fwd
    pooled = jax.jit(blocks_fwd)(params, feats)

    @jax.jit
    def head_fwd(p, z):
        from sequoia_tpu.ops.nn import layer_norm, linear
        z = layer_norm(z, p["head_ln_scale"], p["head_ln_bias"])
        return linear(z, p["head_w"], p["head_b"])

    out["head_fwd_ms"] = timeit(head_fwd, params, pooled) * 1e3

    # 3. forward+backward (grads only, no optimizer, no metrics)
    def loss_fn(p, x, y, v):
        pred = vis.apply(cfg, p, x)
        return stats.masked_mse(pred, y, v)

    grad_fn = jax.jit(jax.grad(loss_fn))
    out["fwd_bwd_ms"] = timeit(grad_fn, params, feats, rna, valid) * 1e3

    # 4. AdamW update alone on a fixed grad tree (donated like the real step)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt_only(p, s, g):
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    t0 = time.perf_counter()
    p2, s2 = opt_only(params, opt_state, grads)
    jax.block_until_ready((p2, s2))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        p2, s2 = opt_only(p2, s2, grads)
    jax.block_until_ready((p2, s2))
    out["adamw_ms"] = (time.perf_counter() - t0) / STEPS * 1e3
    # p,m,v read + p,m,v write + g read, all f32
    opt_bytes = 7 * n_params * 4
    out["adamw_floor_ms"] = opt_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    out["adamw_traffic_mb"] = opt_bytes / 1e6

    # 5. metrics alone (loss/MAE/Pearson over (B, G) on device)
    pred = fwd(params, feats)

    @jax.jit
    def metrics_only(pr, y, v):
        return {"loss": stats.masked_mse(pr, y, v),
                "mae": stats.masked_mae(pr, y, v),
                "corr": stats.mean_correlation(pr, y, v)}

    out["metrics_ms"] = timeit(metrics_only, pred, rna, valid) * 1e3

    # 6. the full production step (fwd+bwd+AdamW+metrics, donated)
    train_step, _ = loop.make_step_fns(lambda p, x: vis.apply(cfg, p, x), opt)
    params2 = vis.init(cfg, jax.random.PRNGKey(1))
    out["full_step_ms"] = timeit_carry(
        train_step, (params2, opt.init(params2)), (feats, rna, valid)) * 1e3

    # analytic floors
    def vis_train_flops() -> float:
        per_block = (2 * T * D * 16 * 64 * 2      # fused f+s projections
                     + 2 * T * 16 * 128 * 64      # combine
                     + 2 * T * 1024 * D           # output projection
                     + 4 * T * D * D)             # FeedForward
        return 3.0 * (6 * per_block + 2 * D * G) * B

    out["flops_tf"] = vis_train_flops() / 1e12
    out["mxu_floor_ms"] = vis_train_flops() / V5E_BF16_PEAK * 1e3
    out["mfu_pct"] = (vis_train_flops()
                      / (out["full_step_ms"] / 1e3) / V5E_BF16_PEAK * 100)
    return out


def profile_he2rna() -> dict:
    import dataclasses

    import jax

    from sequoia_tpu.models import he2rna
    from sequoia_tpu.train import he2rna_fit, loop

    rng = np.random.default_rng(0)
    feats = jax.device_put(rng.normal(size=(B, T, D)).astype(np.float32))
    rna = jax.device_put(rng.normal(size=(B, G)).astype(np.float32))
    valid = jax.device_put(np.ones((B,), bool))
    key = jax.random.PRNGKey(2)

    base = he2rna.HE2RNAConfig(input_dim=D, output_dim=G)
    opt = loop.make_adam(1e-3)
    out: dict = {"per_k_ms": {}}

    # per fixed k: the step the 45adc99 "11.6 ms" was measured at is ONE of
    # these; the real loop samples k uniformly from the sweep every step
    for k in base.ks:
        cfg = dataclasses.replace(base, ks=(k,))
        params = he2rna.init(cfg, jax.random.PRNGKey(1))
        step, _ = he2rna_fit.make_he2rna_step_fns(cfg, opt)
        ms = timeit_carry(step, (params, opt.init(params)),
                          (feats, rna, valid, key)) * 1e3
        out["per_k_ms"][k] = round(ms, 2)
        print(f"  he2rna fixed k={k}: {ms:.2f} ms", file=sys.stderr)

    # expected cost of the uniform-k mixture
    out["uniform_mixture_ms"] = round(
        float(np.mean(list(out["per_k_ms"].values()))), 2)

    # the real random-k step (lax.switch over the sweep), varying key
    params = he2rna.init(base, jax.random.PRNGKey(1))
    step, _ = he2rna_fit.make_he2rna_step_fns(base, opt)
    carry = step(params, opt.init(params), feats, rna, valid, key)[:2]
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for i in range(STEPS * 2):
        carry = step(*carry, feats, rna, valid, jax.random.fold_in(key, i))[:2]
    jax.block_until_ready(carry)
    out["random_k_ms"] = round((time.perf_counter() - t0) / (STEPS * 2) * 1e3,
                               2)

    # backward one-hot contraction FLOPs at each k (f32)
    out["bwd_onehot_tf_at_k"] = {
        k: round(2 * B * G * k * T / 1e12, 3) for k in base.ks}
    return out


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/sequoia_bench_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    res = {"vis": profile_vis(), "he2rna": profile_he2rna()}
    print(json.dumps(res, indent=2, default=str))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
