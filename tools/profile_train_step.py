"""Per-piece roofline profile of the training plane (VERDICT r4 item 1).

Decomposes the two production train steps on the real chip:

* ViS (reference loop being beaten: ``src/vit.py:158-180``) at the
  production shape B=16, T=100 cluster tokens, D=2048, G=20,820 —
  forward, blocks alone, gene head alone, forward+backward, AdamW update
  alone, on-device metrics alone, and the full fused step, next to
  analytic FLOP/byte floors.
* HE2RNA (reference ``src/he2rna.py:108-127``): the train step PER FIXED k
  across the reference sweep ks=(1,2,5,10,20,50,100) plus the random-k
  step the real loop runs — any single number is meaningless without
  stating its k distribution.

Timing methodology (this sandbox's axon relay makes naive timing lie):
``jax.block_until_ready`` is a NO-OP through the relay, and per-dispatch
relay latency is ~1-30 ms — so each piece is timed as K iterations chained
inside ONE ``lax.scan`` under a single jit dispatch, synced by a scalar
host read, at two K values; (t(K2) - t(K1)) / (K2 - K1) cancels the
constant dispatch+sync+relay cost and yields pure device time per step.
The full step is ALSO timed the dispatch-per-step way (what a host-driven
loop sees here); on a real TPU host the two converge.

Prints one JSON dict; run on the TPU host:  python tools/profile_train_step.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

B, T, D, G = 16, 100, 2048, 20820
K1, K2 = 20, 60
V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def _scalar(tree):
    """A tiny scalar data-dependent on every leaf (for host-read sync)."""
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(jnp.reshape(x, (-1,))[:1].astype(jnp.float32))
               for x in jax.tree.leaves(tree))


def scan_time(body, carry, reps: int = 3) -> float:
    """Seconds per `body` iteration, measured on device via lax.scan.

    body: carry -> carry.  Times K1 and K2 chained iterations under one
    jit each, syncing with a float() host read; the difference cancels
    dispatch/relay/sync overhead.  min-of-`reps`.
    """
    import jax

    def run_k(k):
        @jax.jit
        def f(c):
            c2 = jax.lax.scan(lambda cc, _: (body(cc), None), c,
                              None, length=k)[0]
            return _scalar(c2)
        vals = []
        float(f(carry))  # compile + first run
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(carry))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    t1, t2 = run_k(K1), run_k(K2)
    return max((t2 - t1) / (K2 - K1), 0.0)


def dispatch_time(fn, carry, extra, steps: int = 40) -> float:
    """Seconds/step for a host-driven chained loop (dispatch per step),
    synced by a scalar host read — what a real training loop pays here."""
    carry = fn(*carry, *extra)
    float(_ensure_scalar(carry))
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(*carry, *extra)
    float(_ensure_scalar(carry))
    return (time.perf_counter() - t0) / steps


def _ensure_scalar(carry):
    import jax

    leaf = jax.tree.leaves(carry)[0]
    return leaf.ravel()[0]


def profile_vis() -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from sequoia_tpu.models import vis
    from sequoia_tpu.ops import stats
    from sequoia_tpu.train import loop

    # inputs generated ON DEVICE (jax.random) — a wedged sandbox relay
    # makes even a 13 MB device_put take minutes, and timing only needs
    # plausible magnitudes, not a specific numpy stream
    kf, kr = jax.random.split(jax.random.PRNGKey(42))
    feats = jax.random.normal(kf, (B, T, D), jnp.float32)
    rna = jax.random.normal(kr, (B, G), jnp.float32)
    valid = jnp.ones((B,), bool)

    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=6, nheads=16,
                        dim_f=64, dim_s=64, dim_c=64, num_clusters=T,
                        compute_dtype="bfloat16")
    params = vis.init(cfg, jax.random.PRNGKey(0))
    opt = loop.make_adamw(1e-3)
    opt_state = opt.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    out: dict = {"n_params_m": round(n_params / 1e6, 2)}
    eps = jnp.float32(1e-30)

    # NOTE: everything large (params, grads) must travel in the scan CARRY,
    # not as a closure — closed-over trees become HLO constants and the
    # relay's remote_compile rejects >~100 MB request bodies (HTTP 413).

    # 1. forward only (chained: x <- x + eps*mean(pred), not foldable)
    def fwd_body(c):
        p, x = c
        pred = vis.apply(cfg, p, x)
        return p, x + eps * jnp.mean(pred)

    out["fwd_ms"] = scan_time(fwd_body, (params, feats)) * 1e3

    # 2. blocks alone (vis.apply minus the gene head)
    def blocks_pool(p, x):
        if cfg.compute_dtype is not None:
            x = x.astype(cfg.compute_dtype)
        x = x + p["pos_emb"].astype(x.dtype)
        x, _ = jax.lax.scan(lambda c, bp: (vis._block(cfg, c, bp), None),
                            x, p["blocks"])
        return jnp.mean(x.astype(jnp.float32), axis=1)

    def blocks_body(c):
        p, x = c
        z = blocks_pool(p, x)
        return p, x + eps * jnp.mean(z)

    out["blocks_fwd_ms"] = scan_time(blocks_body, (params, feats)) * 1e3

    # 2b. gene head alone: LN + (B,D)@(D,G) GEMM
    from sequoia_tpu.ops.nn import layer_norm, linear
    pooled = jax.jit(blocks_pool)(params, feats)

    def head_body(c):
        p, z = c
        zn = layer_norm(z, p["head_ln_scale"], p["head_ln_bias"])
        y = linear(zn, p["head_w"], p["head_b"])
        return p, z + eps * jnp.mean(y)

    out["head_fwd_ms"] = scan_time(head_body, (params, pooled)) * 1e3
    # head weight is f32 in HBM; fwd streams it once
    out["head_fwd_floor_ms"] = D * G * 4 / (V5E_HBM_GBS * 1e9) * 1e3

    # 3. forward+backward (grads only; chained p <- p - eps*g)
    def loss_fn(p, x, y, v):
        pred = vis.apply(cfg, p, x)
        return stats.masked_mse(pred, y, v)

    def fwd_bwd_body(p):
        g = jax.grad(loss_fn)(p, feats, rna, valid)
        return jax.tree.map(lambda a, b: a - eps * b, p, g)

    out["fwd_bwd_ms"] = scan_time(fwd_bwd_body, params) * 1e3

    # 4. AdamW update alone on a fixed grad tree (grads in the carry)
    grads = jax.tree.map(jnp.ones_like, params)

    def opt_body(c):
        p, s, g = c
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, g

    out["adamw_ms"] = scan_time(opt_body, (params, opt_state, grads)) * 1e3
    # p,m,v read + p,m,v write + g read, all f32
    opt_bytes = 7 * n_params * 4
    out["adamw_floor_ms"] = opt_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    out["adamw_traffic_mb"] = round(opt_bytes / 1e6, 1)

    # 4b. A/B: the opt-in low-memory AdamW (bf16 moments, f32 math) —
    # m,v traffic halves (loop.make_adamw(moment_dtype=...))
    opt16 = loop.make_adamw(1e-3, moment_dtype="bfloat16")

    def opt16_body(c):
        p, s, g = c
        updates, s = opt16.update(g, s, p)
        return optax.apply_updates(p, updates), s, g

    out["adamw_bf16_ms"] = scan_time(
        opt16_body, (params, opt16.init(params), grads)) * 1e3
    opt16_bytes = (3 * 4 + 4 * 2) * n_params  # p r/w + g read f32; m,v bf16
    out["adamw_bf16_floor_ms"] = opt16_bytes / (V5E_HBM_GBS * 1e9) * 1e3

    # 5. metrics alone (loss/MAE/Pearson over (B, G) on device)
    pred0 = jax.jit(lambda p, x: vis.apply(cfg, p, x))(params, feats)

    def metrics_body(pr):
        m = {"loss": stats.masked_mse(pr, rna, valid),
             "mae": stats.masked_mae(pr, rna, valid),
             "corr": stats.mean_correlation(pr, rna, valid)}
        return pr + eps * (m["loss"] + m["mae"] + m["corr"])

    out["metrics_ms"] = scan_time(metrics_body, pred0) * 1e3

    # 6. the full production step: scan-timed (pure device) AND
    #    dispatch-per-step (what a host loop pays through this relay)
    train_step, _ = loop.make_step_fns(lambda p, x: vis.apply(cfg, p, x), opt)

    def full_body(c):
        p, s = c
        loss, g = jax.value_and_grad(loss_fn)(p, feats, rna, valid)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return p, s

    out["full_step_device_ms"] = scan_time(
        full_body, (params, opt_state)) * 1e3

    # 6b. the full step with the bf16-moment optimizer (the one remaining
    # close-out lever): grads + update fused in one program
    def full16_body(c):
        p, s = c
        loss, g = jax.value_and_grad(loss_fn)(p, feats, rna, valid)
        updates, s = opt16.update(g, s, p)
        return optax.apply_updates(p, updates), s

    out["full_step_bf16moments_device_ms"] = scan_time(
        full16_body, (params, opt16.init(params))) * 1e3

    params2 = vis.init(cfg, jax.random.PRNGKey(1))

    def step2(p, s, x, y, v):
        return train_step(p, s, x, y, v)[:2]

    out["full_step_dispatched_ms"] = dispatch_time(
        step2, (params2, opt.init(params2)), (feats, rna, valid)) * 1e3

    # analytic floors
    def vis_train_flops() -> float:
        per_block = (2 * T * D * 16 * 64 * 2      # fused f+s projections
                     + 2 * T * 16 * 128 * 64      # combine
                     + 2 * T * 1024 * D           # output projection
                     + 4 * T * D * D)             # FeedForward
        return 3.0 * (6 * per_block + 2 * D * G) * B

    out["flops_tf"] = round(vis_train_flops() / 1e12, 4)
    out["mxu_floor_ms"] = vis_train_flops() / V5E_BF16_PEAK * 1e3
    out["mfu_pct_device"] = (vis_train_flops()
                             / (out["full_step_device_ms"] / 1e3)
                             / V5E_BF16_PEAK * 100)
    return out


def profile_he2rna() -> dict:
    import dataclasses

    import jax
    import optax

    from sequoia_tpu.models import he2rna
    from sequoia_tpu.ops import stats
    from sequoia_tpu.train.loop import make_adam

    import jax.numpy as jnp

    # on-device inputs: see profile_vis (relay-robust)
    kf, kr = jax.random.split(jax.random.PRNGKey(43))
    feats = jax.random.normal(kf, (B, T, D), jnp.float32)
    rna = jax.random.normal(kr, (B, G), jnp.float32)
    valid = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(2)

    base = he2rna.HE2RNAConfig(input_dim=D, output_dim=G)
    opt = make_adam(1e-3)
    out: dict = {"per_k_ms": {}}

    def make_body(cfg):
        def loss_fn(p, r):
            pred = he2rna.apply(cfg, p, feats, train=True, rng=r)
            return stats.masked_mse(pred, rna, valid)

        def body(c):
            p, s, r = c
            r, sub = jax.random.split(r)
            g = jax.grad(loss_fn)(p, sub)
            updates, s = opt.update(g, s, p)
            return optax.apply_updates(p, updates), s, r

        return body

    # per fixed k: the docs' historical "11.6 ms" was ONE of these; the
    # real loop samples k uniformly per step (lax.switch over the sweep)
    for k in base.ks:
        cfg = dataclasses.replace(base, ks=(k,))
        params = he2rna.init(cfg, jax.random.PRNGKey(1))
        ms = scan_time(make_body(cfg), (params, opt.init(params), key)) * 1e3
        out["per_k_ms"][k] = round(ms, 2)
        print(f"  he2rna fixed k={k}: {ms:.2f} ms", file=sys.stderr)

    out["uniform_mixture_ms"] = round(
        float(np.mean(list(out["per_k_ms"].values()))), 2)

    # the real random-k step (lax.switch over the sweep)
    params = he2rna.init(base, jax.random.PRNGKey(1))
    out["random_k_device_ms"] = round(
        scan_time(make_body(base), (params, opt.init(params), key)) * 1e3, 2)

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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("all", "vis"):
        res["vis"] = profile_vis()
    if which in ("all", "he2rna"):
        res["he2rna"] = profile_he2rna()
    print(json.dumps(res, indent=2, default=str))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
