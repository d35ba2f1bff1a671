"""Device-side training/eval metrics (masked for fixed-shape padded batches).

Reference semantics reproduced:
* ``compute_correlations`` (reference ``src/he2rna.py:140-149``): per-gene
  Pearson r over the batch, genes with constant targets skipped, NaN r
  dropped, mean over the rest.
* ``smape`` (reference ``src/vit.py:32-33``): ``100/B * sum(2|F-A| /
  (|A|+|F|))`` — the sum runs over ALL elements while dividing by the row
  count only (reproduced as-is); 0/0 elements contribute 0.
* MSE/MAE are plain batch means over the valid rows.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mse(pred, target, valid):
    m = valid[:, None].astype(pred.dtype)
    n = jnp.maximum(jnp.sum(valid), 1).astype(pred.dtype)
    return jnp.sum(jnp.square(pred - target) * m) / (n * target.shape[1])


def masked_mae(pred, target, valid):
    m = valid[:, None].astype(pred.dtype)
    n = jnp.maximum(jnp.sum(valid), 1).astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - target) * m) / (n * target.shape[1])


def masked_smape(pred, target, valid):
    m = valid[:, None].astype(pred.dtype)
    n = jnp.maximum(jnp.sum(valid), 1).astype(pred.dtype)
    num = 2.0 * jnp.abs(pred - target)
    den = jnp.abs(target) + jnp.abs(pred)
    ratio = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    return 100.0 / n * jnp.sum(ratio * m)


def pearson_per_gene(pred, target, valid):
    """(G,) per-gene Pearson r over valid rows; NaN where undefined."""
    m = valid[:, None].astype(pred.dtype)
    n = jnp.maximum(jnp.sum(valid), 1).astype(pred.dtype)
    mp = jnp.sum(pred * m, axis=0) / n
    mt = jnp.sum(target * m, axis=0) / n
    dp = (pred - mp) * m
    dt = (target - mt) * m
    cov = jnp.sum(dp * dt, axis=0)
    vp = jnp.sum(dp * dp, axis=0)
    vt = jnp.sum(dt * dt, axis=0)
    return cov / jnp.sqrt(vp * vt)


def mean_correlation(pred, target, valid):
    """Mean per-gene Pearson r, skipping constant-target genes and NaN r
    (reference ``compute_correlations``)."""
    m = valid[:, None].astype(pred.dtype)
    n = jnp.maximum(jnp.sum(valid), 1).astype(pred.dtype)
    mt = jnp.sum(target * m, axis=0) / n
    dt = (target - mt) * m
    vt = jnp.sum(dt * dt, axis=0)
    r = pearson_per_gene(pred, target, valid)
    ok = (vt > 0) & ~jnp.isnan(r)
    denom = jnp.maximum(jnp.sum(ok), 1)
    mean_r = jnp.sum(jnp.where(ok, r, 0.0)) / denom
    # every gene skipped -> NaN, matching the reference's np.mean over an
    # empty list (a fabricated 0.0 would count as a real score in the
    # epoch mean that drives best-model selection)
    return jnp.where(jnp.sum(ok) > 0, mean_r, jnp.nan)
