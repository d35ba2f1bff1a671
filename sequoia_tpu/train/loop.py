"""Training / evaluation loops with the reference's exact selection logic.

Behavior contract (reference ``src/vit.py:117-311``):

* MSE loss, AdamW; per-epoch metrics are the *mean of per-batch values*
  (loss, MAE, mean per-gene Pearson r), matching the reference's
  ``np.mean(losses[phase])`` over batches.
* Model selection + early stopping with ``save_on``/``stop_on`` in
  {``loss``, ``loss+corr``} and ``patience``/``delta`` as in the reference:
  the patience-on-loss trip ("early_stop_on_loss_triggered") switches
  saving to best-correlation-while-loss-within-delta.
* ``evaluate`` returns ``(preds, real, wsis, projs)`` concatenated over the
  loader (reference ``vit.py:245-291``); ``predict`` is the label-free
  variant (``vit.py:293-311``).

TPU-first: one compiled train step (fixed batch shapes via BatchLoader
padding) computing loss/MAE/corr on device — the reference syncs every batch
to host numpy for metrics; we transfer three scalars instead.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sequoia_tpu.data.dataset import BatchLoader
from sequoia_tpu.ops import stats


def make_adamw(lr: float = 1e-3, weight_decay: float = 0.0,
               moment_dtype: str | None = None) -> optax.GradientTransformation:
    """torch.optim.AdamW defaults (betas .9/.999, eps 1e-8, amsgrad=False).

    ``moment_dtype``: None (default) is the f32 optax parity path.  A dtype
    string (e.g. "bfloat16") switches to a first-party AdamW that STORES
    both moments in that dtype while doing all update math in f32 — the
    train step's optimizer piece is HBM-bound (docs/BENCHMARKS.md
    "train-step close-out": p,m,v read+write + g read = 3.69 GB/step at the
    production G=20,820 head, ~6.2 ms at achieved bandwidth), and bf16
    moments cut that traffic ~29% (2×527 MB of m,v halve).  Opt-in and
    non-parity: the reference trains torch AdamW with f32 state, so the
    trained-quality parity gates keep the default."""
    if moment_dtype is None:
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    return _adamw_low_mem(lr, 0.9, 0.999, 1e-8, weight_decay,
                          jnp.dtype(moment_dtype))


def _adamw_low_mem(lr, b1, b2, eps, weight_decay,
                   moment_dtype) -> optax.GradientTransformation:
    """AdamW with both moments stored in ``moment_dtype`` (update math f32).

    Same decoupled-weight-decay formulation as optax.adamw:
    ``p -= lr * (m_hat / (sqrt(v_hat) + eps) + wd * p)``.  At
    moment_dtype=f32 this matches optax to f32 roundoff (pinned by test).
    The state is a plain dict whose ``mu``/``nu`` subtrees mirror the param
    pytree, so ``parallel.sharding.opt_state_pspecs`` shards them like the
    params (gene-head moments stay on the 'model' axis)."""

    def init(params):
        z = lambda p: jnp.zeros(p.shape, moment_dtype)  # noqa: E731
        return {"count": jnp.zeros([], jnp.int32),
                "mu": jax.tree.map(z, params),
                "nu": jax.tree.map(z, params)}

    def update(grads, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), t)
        bc2 = 1.0 - jnp.power(jnp.float32(b2), t)
        mu = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32), state["mu"], grads)
        nu = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state["nu"], grads)
        updates = jax.tree.map(
            lambda m, v, p: (-lr * (m / bc1 / (jnp.sqrt(v / bc2) + eps)
                                    + weight_decay * p.astype(jnp.float32))
                             ).astype(p.dtype), mu, nu, params)
        cast = lambda t_: jax.tree.map(  # noqa: E731
            lambda x: x.astype(moment_dtype), t_)
        return updates, {"count": count, "mu": cast(mu), "nu": cast(nu)}

    return optax.GradientTransformation(init, update)


def make_adam(lr: float) -> optax.GradientTransformation:
    """torch.optim.Adam with weight_decay=0 (reference he2rna fit)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def make_eval_step(apply_fn: Callable):
    """Jitted eval step (no optimizer needed — evaluate() uses this
    directly instead of building a throwaway AdamW)."""

    @jax.jit
    def eval_step(params, feats, rna, valid):
        pred = apply_fn(params, feats)
        metrics = {
            "loss": stats.masked_mse(pred, rna, valid),
            "mae": stats.masked_mae(pred, rna, valid),
            "corr": stats.mean_correlation(pred, rna, valid),
            "smape": stats.masked_smape(pred, rna, valid),
        }
        return pred, metrics

    return eval_step


def make_step_fns(apply_fn: Callable, optimizer: optax.GradientTransformation):
    """Build jitted (train_step, eval_step) for a ``pred = apply_fn(params, x)``
    model (ViS/ViT).  HE2RNA has its own steps (dropout rng + k sampling)."""

    def loss_fn(params, feats, rna, valid):
        pred = apply_fn(params, feats)
        return stats.masked_mse(pred, rna, valid), pred

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, rna, valid):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, feats, rna, valid)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "mae": stats.masked_mae(pred, rna, valid),
            "corr": stats.mean_correlation(pred, rna, valid),
        }
        return params, opt_state, metrics

    return train_step, make_eval_step(apply_fn)


@dataclasses.dataclass
class TrainResult:
    params: dict           # best-checkpoint params (what model_best_{i}.pt holds)
    history: list[dict]
    best_epoch: int
    final_params: dict | None = None  # last-epoch params — the reference's
    # ``train`` returns the live module and ``main.py:193`` evaluates it
    # directly, so test_results.pkl reflects the FINAL model, not the best


def train(apply_fn, params, optimizer, loaders: dict[str, BatchLoader], *,
          num_epochs: int = 200, patience: int = 20, delta: float = 0.5,
          save_on: str = "loss", stop_on: str = "loss",
          phases=("train", "val"), save_fn: Callable | None = None,
          log_fn: Callable | None = None, verbose: bool = True,
          state_path: str | None = None,
          prefetch_depth: int = 2, mesh=None,
          h2d_dtype: str | None = None) -> TrainResult:
    """Reference ``vit.train`` semantics over jitted steps.

    ``save_fn(params)`` is invoked whenever the reference would have written
    ``model_best_{split}.pt``; the returned ``TrainResult.params`` are the
    last-saved (best) parameters.

    ``state_path`` enables full resume (params + optimizer + early-stop
    counters are checkpointed after every epoch and restored on restart) —
    an addition over the reference's best-weights-only saves.

    ``mesh``: a ``jax.sharding.Mesh`` with ('data', 'model') axes enables
    multi-chip training — params placed via ``parallel.shard_params`` (gene
    head over 'model'), every batch sharded over 'data'; XLA inserts the
    gradient collectives.

    ``h2d_dtype``: cast the feature batch to this dtype ON HOST (on the
    prefetch thread) before upload.  Pass the model's ``compute_dtype``
    when it is set: ViS/ViT ``apply`` cast the input to that dtype as
    their FIRST op, and the host-side numpy cast and XLA's on-device
    convert are both round-to-nearest-even, so the step is bit-identical
    while the dominant h2d transfer (the (B, T, D) features; ~13 MB/batch
    f32 at production shapes vs the reference's per-batch ``.to(device)``,
    src/vit.py:160-161) halves for bf16.  Targets/masks are not touched
    (the loss stays f32).  Do NOT set this for a model that does not cast
    its input (``compute_dtype=None``) — there it would change the math.

    Memory note: with neither ``save_fn`` nor ``state_path``, the best
    snapshot is kept as an on-chip copy (one extra param set of HBM, ~520 MB
    f32 at the production G=20,820 head) because downloading it per
    improving epoch costs more than the epoch itself on a slow host link;
    the previous snapshot is released before each copy and an allocation
    failure degrades to a host snapshot automatically.
    """
    from sequoia_tpu.train import checkpoint as ckpt_io

    train_step, eval_step = make_step_fns(apply_fn, optimizer)
    if mesh is not None:
        from sequoia_tpu.parallel import sharding as _sh

        params = _sh.shard_params(mesh, params)
        opt_state = _sh.shard_opt_state(mesh, optimizer.init(params), params)
    else:
        opt_state = optimizer.init(params)

    best_params = jax.tree.map(lambda x: np.asarray(x), params)
    best_loss = np.inf
    best_score = 0.0
    best_epoch = -1
    epoch_since_best = 0
    epoch_since_best_score = 0
    epoch_since_ok_loss = 0
    early_stop_on_loss_triggered = 0
    history: list[dict] = []
    start_epoch = 0

    import os
    if state_path and os.path.exists(state_path):
        packed, opt_state, meta = ckpt_io.load_train_state(state_path)
        params, best_params = packed["params"], packed["best"]
        (start_epoch, best_loss, best_score, best_epoch, epoch_since_best,
         epoch_since_best_score, epoch_since_ok_loss,
         early_stop_on_loss_triggered) = (
            meta["epoch"] + 1, meta["best_loss"], meta["best_score"],
            meta["best_epoch"], meta["epoch_since_best"],
            meta["epoch_since_best_score"], meta["epoch_since_ok_loss"],
            meta["early_stop_on_loss_triggered"])
        history = meta.get("history", [])
        if meta.get("stopped"):
            # the fold had already early-stopped: resuming must not train
            # further (the == patience trip point is behind us)
            start_epoch = num_epochs
        if mesh is not None:
            # the npz holds host arrays; without re-sharding, training
            # would silently continue with the gene head + AdamW moments
            # fully replicated on every chip
            from sequoia_tpu.parallel import sharding as _sh

            params = _sh.shard_params(mesh, params)
            opt_state = _sh.shard_opt_state(mesh, opt_state, params)
        if verbose:
            print(f"resumed training state from {state_path} at epoch "
                  f"{start_epoch}")

    def save(p, epoch):
        nonlocal best_params, best_epoch
        if save_fn is None and state_path is None:
            # nothing consumes the snapshot until training ends: keep it as
            # a DEVICE copy (an on-chip buffer copy) instead of downloading
            # the full ~520 MB f32 param set to host on every improving
            # epoch — np.asarray-ing the tree per save cost more wall time
            # than the 16 train steps of the epoch on a slow host link;
            # materialized to numpy once at return.  Release the previous
            # snapshot FIRST so peak extra HBM stays at one param set, and
            # degrade to a host snapshot if the copy cannot allocate —
            # safe because ``p`` (the improving params) is what the
            # snapshot is being replaced with anyway.
            best_params = None
            try:
                best_params = jax.tree.map(jnp.copy, p)
            except Exception:  # noqa: BLE001 — RESOURCE_EXHAUSTED et al.
                best_params = jax.tree.map(lambda x: np.asarray(x), p)
        else:
            best_params = jax.tree.map(lambda x: np.asarray(x), p)
            if save_fn is not None:
                save_fn(best_params)
        best_epoch = epoch

    feat_np_dtype = np.dtype(jnp.dtype(h2d_dtype)) if h2d_dtype else None

    def to_device(batch):
        """(feats, rna, valid) on device, or None for an all-pad batch."""
        if batch.n_valid == 0:
            return None
        feats = batch.features
        if feat_np_dtype is not None and feats.dtype != feat_np_dtype:
            feats = np.asarray(feats).astype(feat_np_dtype)
        if mesh is not None:
            from sequoia_tpu.parallel import sharding as _sh

            return _sh.shard_batch_arrays(mesh, feats, batch.rna, batch.valid)
        return (jnp.asarray(feats), jnp.asarray(batch.rna),
                jnp.asarray(batch.valid))

    # Per-phase "step has compiled" gates: worker-thread uploads may only
    # start once that phase's jitted step exists — overlapping an h2d
    # transfer with a first-call compile can wedge remote-compile backends
    # (observed live on the TPU sandbox relay).  Until the gate opens the
    # worker passes host batches through and the main thread converts.
    import threading as _threading
    _step_ready = {p: _threading.Event() for p in phases}

    for epoch in range(start_epoch, num_epochs):
        epoch_metrics: dict[str, dict[str, float]] = {}
        for phase in phases:
            accum: list[dict] = []
            from sequoia_tpu.data.dataset import prefetch as _prefetch

            ready = _step_ready[phase]

            def transform(batch, _ready=ready):
                # runs on the prefetch thread: batch i+1's h2d overlaps
                # batch i's step (the double-buffered host pipeline from
                # SURVEY.md section 5) — but only after the step compiled
                return to_device(batch) if _ready.is_set() else batch

            batches = (_prefetch(loaders[phase], depth=prefetch_depth,
                                 transform=transform)
                       if prefetch_depth else
                       map(transform, loaders[phase]))
            try:
                for item in batches:
                    dev = to_device(item) if hasattr(item, "n_valid") else item
                    if dev is None:
                        continue
                    feats, rna, valid = dev
                    if phase == "train":
                        params, opt_state, m = train_step(params, opt_state,
                                                          feats, rna, valid)
                    else:
                        _, m = eval_step(params, feats, rna, valid)
                    ready.set()  # step call returned => compile is done
                    accum.append(m)
            finally:
                # an exception mid-epoch must not strand the reader thread
                # blocked on its bounded queue
                if prefetch_depth:
                    batches.close()
            accum = jax.device_get(accum)
            means = {k: float(np.mean([a[k] for a in accum])) for k in accum[0]} \
                if accum else {"loss": np.nan, "mae": np.nan, "corr": np.nan}
            epoch_metrics[phase] = means
            if log_fn:
                log_fn(epoch, phase, means)
            if verbose:
                print(f"Epoch {epoch}: {phase} loss {means['loss']:.6f} "
                      f"mae {means['mae']:.6f} corr {means['corr']:.4f}")

            if (phase == "val") or (len(phases) == 1):
                losses = means["loss"]
                scores = means["corr"]

                if early_stop_on_loss_triggered == 1:
                    if losses < (best_loss + delta):
                        epoch_since_ok_loss = 0
                    else:
                        epoch_since_ok_loss += 1

                if losses < best_loss:
                    best_loss = losses
                    epoch_since_best = 0
                    if save_on == "loss":
                        save(params, epoch)
                    elif save_on == "loss+corr" and early_stop_on_loss_triggered == 0:
                        save(params, epoch)
                else:
                    epoch_since_best += 1

                if scores > best_score:
                    best_score = scores
                    epoch_since_best_score = 0
                    if save_on == "loss+corr" and early_stop_on_loss_triggered == 1:
                        save(params, epoch)
                        if verbose:
                            print(f"Saved model on loss+corr at epoch {epoch}")
                else:
                    epoch_since_best_score += 1

        history.append(epoch_metrics)

        # reference == comparisons kept verbatim (vit.py:229-242; >= would
        # change reachable loss+corr semantics where a counter is already
        # past patience when the trigger fires)
        stop_now = False
        if epoch_since_best == patience:
            early_stop_on_loss_triggered = 1
            if stop_on == "loss":
                if verbose:
                    print(f"Early stopping at epoch {epoch}!")
                stop_now = True

        if not stop_now and stop_on == "loss+corr":
            if early_stop_on_loss_triggered == 1 and epoch_since_best_score == patience:
                if verbose:
                    print(f"Early stopping at epoch {epoch}: neither loss nor "
                          "score improving")
                stop_now = True
            elif early_stop_on_loss_triggered == 1 and epoch_since_ok_loss == patience:
                if verbose:
                    print(f"Early stopping at epoch {epoch}: loss left the "
                          f"{delta} band around the best loss")
                stop_now = True

        # state is saved AFTER the stop/trigger decisions so a resumed run
        # sees the post-decision flags: a pre-decision snapshot made a
        # tripped fold resume past its == patience check and train to
        # num_epochs with the loss+corr saving phase never activating
        if state_path:
            ckpt_io.save_train_state(
                state_path,
                {"params": jax.tree.map(np.asarray, params),
                 "best": best_params},
                jax.tree.map(np.asarray, opt_state),
                {"epoch": epoch, "best_loss": float(best_loss),
                 "best_score": float(best_score), "best_epoch": best_epoch,
                 "epoch_since_best": epoch_since_best,
                 "epoch_since_best_score": epoch_since_best_score,
                 "epoch_since_ok_loss": epoch_since_ok_loss,
                 "early_stop_on_loss_triggered": early_stop_on_loss_triggered,
                 "stopped": int(stop_now),
                 "history": history})

        if stop_now:
            break

    final_params = jax.tree.map(lambda x: np.asarray(x), params)
    if best_epoch < 0:  # never saved (e.g. 0 epochs): return current params
        best_params = final_params
    else:  # may be a device-side snapshot (see save()): one host download
        best_params = jax.tree.map(lambda x: np.asarray(x), best_params)
    return TrainResult(params=best_params, history=history,
                       best_epoch=best_epoch, final_params=final_params)


def _gather(loader, fn):
    preds, real, wsis, projs = [], [], [], []
    metrics_accum = []
    for batch in loader:
        if batch.n_valid == 0:
            continue
        pred, m = fn(jnp.asarray(batch.features), jnp.asarray(batch.rna),
                     jnp.asarray(batch.valid))
        pred = np.asarray(pred)[batch.valid]
        preds.append(pred)
        real.append(batch.rna[batch.valid])
        wsis.extend([w for w, v in zip(batch.wsi, batch.valid) if v])
        projs.extend([p for p, v in zip(batch.project, batch.valid) if v])
        metrics_accum.append(jax.device_get(m))
    preds = np.concatenate(preds, axis=0) if preds else np.zeros((0, 0))
    real = np.concatenate(real, axis=0) if real else np.zeros((0, 0))
    means = ({k: float(np.mean([a[k] for a in metrics_accum])) for k in metrics_accum[0]}
             if metrics_accum else {})
    return preds, real, np.asarray(wsis), np.asarray(projs), means


def evaluate(apply_fn, params, loader: BatchLoader, *, verbose: bool = True,
             log_fn: Callable | None = None, suffix: str = ""):
    """Reference ``vit.evaluate``: returns (preds, real, wsis, projs)."""
    eval_step = make_eval_step(apply_fn)

    preds, real, wsis, projs, means = _gather(
        loader, lambda f, r, v: eval_step(params, f, r, v))
    if log_fn and means:
        log_fn(0, "test" + suffix, means)
    if verbose and means:
        print(f"Test loss: {means['loss']:.6f}  MAE: {means['mae']:.6f}  "
              f"SMAPE: {means['smape']:.4f}")
    return preds, real, wsis, projs


def predict(apply_fn, params, loader: BatchLoader):
    """Reference ``vit.predict``: label-free batched inference."""
    fwd = jax.jit(apply_fn)
    preds, wsis, projs = [], [], []
    for batch in loader:
        if batch.n_valid == 0:
            continue
        pred = np.asarray(fwd(params, jnp.asarray(batch.features)))[batch.valid]
        preds.append(pred)
        wsis.extend([w for w, v in zip(batch.wsi, batch.valid) if v])
        projs.extend([p for p, v in zip(batch.project, batch.valid) if v])
    preds = np.concatenate(preds, axis=0) if preds else np.zeros((0, 0))
    return preds, np.asarray(wsis), np.asarray(projs)
