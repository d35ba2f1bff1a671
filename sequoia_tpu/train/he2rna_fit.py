"""HE2RNA training ("fit") with the reference's selection semantics.

Behavior contract (reference ``src/he2rna.py:108-320``; fit at ``:217-320``):
* Adam (not AdamW), weight_decay=0; MSE loss.
* Train-mode forward samples one k per step and applies Dropout(0.5).
* Validation each epoch: loss on raw predictions, mean per-gene Pearson on
  ReLU(predictions); best model = highest correlation score, patience 100.
* An initial pre-training evaluation seeds ``best`` (NaN -> 0).
* Prediction applies ReLU (reference ``he2rna_predict``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sequoia_tpu.data.dataset import BatchLoader
from sequoia_tpu.models import he2rna
from sequoia_tpu.ops import stats
from sequoia_tpu.train.loop import make_adam


def make_he2rna_step_fns(cfg: he2rna.HE2RNAConfig,
                         optimizer: optax.GradientTransformation):
    def loss_fn(params, feats, rna, valid, rng):
        pred = he2rna.apply(cfg, params, feats, train=True, rng=rng)
        return stats.masked_mse(pred, rna, valid)

    @partial(jax.jit, donate_argnums=(0, 1, 5))
    def train_step(params, opt_state, feats, rna, valid, rng):
        """One Adam step; the RNG is split ON DEVICE and the successor key
        returned, so a host training loop chains steps without a per-step
        host->device key dispatch (TPU-idiomatic; also what keeps the
        dispatched step cost at the device cost through a slow transport).
        Returns ``(params, opt_state, loss, next_rng)``."""
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, rna, valid,
                                                  sub)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rng

    @jax.jit
    def eval_step(params, feats, rna, valid):
        pred = he2rna.apply(cfg, params, feats, train=False)
        relu_pred = jax.nn.relu(pred)
        metrics = {
            "loss": stats.masked_mse(pred, rna, valid),
            "corr": stats.mean_correlation(relu_pred, rna, valid),
        }
        return relu_pred, metrics

    return train_step, eval_step


def he2rna_evaluate(cfg, params, loader: BatchLoader, eval_step=None):
    """(valid_loss, mean_corr) — reference ``he2rna.evaluate`` epoch metrics.

    Pass ``eval_step`` (from :func:`make_he2rna_step_fns`) when calling in
    a loop — a fresh closure per call would retrace/recompile the identical
    forward every epoch."""
    if eval_step is None:
        _, eval_step = make_he2rna_step_fns(cfg, make_adam(1e-3))
    losses, preds, labels = [], [], []
    for batch in loader:
        if batch.n_valid == 0:
            continue
        p, m = eval_step(params, jnp.asarray(batch.features),
                         jnp.asarray(batch.rna), jnp.asarray(batch.valid))
        losses.append(float(m["loss"]))
        preds.append(np.asarray(p)[batch.valid])
        labels.append(batch.rna[batch.valid])
    if not losses:
        return np.nan, np.nan
    preds = np.concatenate(preds)
    labels = np.concatenate(labels)
    score = host_compute_correlations(labels, preds)
    return float(np.mean(losses)), score


def host_compute_correlations(labels: np.ndarray, preds: np.ndarray) -> float:
    """Reference ``compute_correlations`` on host over the FULL split (the
    he2rna path evaluates correlations on concatenated predictions)."""
    rs = []
    for i in range(labels.shape[1]):
        y = labels[:, i]
        if len(np.unique(y)) > 1:
            with np.errstate(invalid="ignore"):
                rs.append(np.corrcoef(y, preds[:, i])[0, 1])
    rs = np.asarray(rs)
    rs = rs[~np.isnan(rs)]
    return float(np.mean(rs)) if rs.size else np.nan


def he2rna_predict(cfg, params, loader: BatchLoader, eval_step=None):
    """(relu_preds, labels, wsis, projs) — reference ``he2rna_predict``."""
    if eval_step is None:
        _, eval_step = make_he2rna_step_fns(cfg, make_adam(1e-3))
    preds, labels, wsis, projs = [], [], [], []
    for batch in loader:
        if batch.n_valid == 0:
            continue
        p, _ = eval_step(params, jnp.asarray(batch.features),
                         jnp.asarray(batch.rna), jnp.asarray(batch.valid))
        preds.append(np.asarray(p)[batch.valid])
        labels.append(batch.rna[batch.valid])
        wsis.extend([w for w, v in zip(batch.wsi, batch.valid) if v])
        projs.extend([p_ for p_, v in zip(batch.project, batch.valid) if v])
    if not preds:  # every batch empty/unreadable: empty arrays, not a
        # ValueError from np.concatenate (mirrors loop._gather)
        g = getattr(loader.ds, "num_genes", 0)
        return (np.zeros((0, g), np.float32), np.zeros((0, g), np.float32),
                np.asarray([], str), np.asarray([], str))
    return (np.concatenate(preds), np.concatenate(labels),
            np.asarray(wsis), np.asarray(projs))


def fit(cfg, params, lr, train_loader, valid_loader, test_loader, *,
        max_epochs: int = 200, patience: int = 100, seed: int = 0,
        save_fn=None, log_fn=None, verbose: bool = True):
    """Reference ``he2rna.fit``: returns (preds, labels, wsis, projs) when a
    test loader is given, else the best params."""
    optimizer = make_adam(lr)
    train_step, eval_step = make_he2rna_step_fns(cfg, optimizer)
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(seed)

    if valid_loader is not None:
        _, best = he2rna_evaluate(cfg, params, valid_loader,
                                  eval_step)
        if np.isnan(best):
            best = 0.0
        if verbose:
            print(f"correlations: {best:.3f}")
    else:
        best = 0.0

    best_params = jax.tree.map(np.asarray, params)
    saved_any = False
    epoch_since_best = 0
    for e in range(max_epochs):
        epoch_since_best += 1
        tlosses = []
        for batch in train_loader:
            if batch.n_valid == 0:
                continue
            params, opt_state, loss, rng = train_step(
                params, opt_state, jnp.asarray(batch.features),
                jnp.asarray(batch.rna), jnp.asarray(batch.valid), rng)
            # keep the scalar ON DEVICE; ONE host transfer per epoch below
            # (a float() here would stall the step pipeline every batch)
            tlosses.append(loss)
        train_loss = (float(np.mean(jax.device_get(tlosses)))
                      if tlosses else np.nan)

        if valid_loader is not None:
            valid_loss, score = he2rna_evaluate(
                cfg, params, valid_loader, eval_step)
            if log_fn:
                log_fn(e, "val", {"loss": valid_loss, "corr": score,
                                  "train_loss": train_loss})
            if verbose:
                print(f"Epoch {e + 1}/{max_epochs} loss: {train_loss:.4f}, "
                      f"val loss: {valid_loss:.4f}, correlations: {score:.3f}")
            if score > best:
                epoch_since_best = 0
                best = score
                best_params = jax.tree.map(np.asarray, params)
                saved_any = True
                if save_fn is not None:
                    save_fn(best_params)
            if epoch_since_best == patience:
                if verbose:
                    print(f"Early stopping at epoch {e + 1}")
                break
        elif verbose:
            print(f"Epoch {e + 1}/{max_epochs} loss: {train_loss:.4f}")

    if not saved_any:
        # Reference fit(): if no epoch ever improved on the initial score,
        # the FINAL model is saved and used (he2rna.py trailing elif branch).
        best_params = jax.tree.map(np.asarray, params)
        if save_fn is not None:
            save_fn(best_params)

    if test_loader is not None:
        return he2rna_predict(cfg, best_params, test_loader,
                              eval_step)
    return best_params
