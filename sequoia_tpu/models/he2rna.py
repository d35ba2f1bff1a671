"""HE2RNA — the MLP (1x1-conv) aggregation baseline.

Behavior contract (reference ``src/he2rna.py:42-106``, itself derived from
Owkin's HE2RNA): per-tile scoring MLP ``D -> 256 -> 256 -> G`` (1x1 Conv1d ==
dense over the feature axis) with ReLU + Dropout(0.5) between layers, then a
top-k masked mean over tiles:

* ``mask`` marks tiles whose feature max > 0 (zero-padded tiles drop out).
* training: ``k`` is sampled uniformly from ``ks`` per forward pass;
* eval: predictions for every ``k`` in ``ks`` are averaged;
* the masked mean divides by ``sum(mask[:, :, :k])`` — the mask of the FIRST
  ``k`` tiles in input order, not of the top-k tiles.  This is quirky but
  load-bearing (it rescales by the padded-tile count when k exceeds the
  number of real tiles) and is reproduced exactly.
* the reference applies ReLU to predictions at eval/predict time only
  (he2rna.py evaluate/he2rna_predict) — that lives in the caller, not here,
  same as the reference.

TPU-first: tiles are a batched axis of one big ``(B*T, D)`` GEMM chain; the
eval-time k-sweep reuses the tile scores (computed once) across all ks —
the reference recomputes the full conv stack per k; we don't, the math is
identical because scores don't depend on k.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from sequoia_tpu.ops.nn import linear, matmul_precision
from sequoia_tpu.utils import torch_init

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HE2RNAConfig:
    """Defaults = reference ``src/he2rna.py:392-394``."""

    input_dim: int
    output_dim: int
    layers: tuple[int, ...] = (256, 256)
    ks: tuple[int, ...] = (1, 2, 5, 10, 20, 50, 100)
    dropout: float = 0.5


def ks_for_tokens(tokens: int | None) -> tuple[int, ...]:
    """The reference k sweep (``he2rna.py:83``) filtered to k <= the store's
    token count — identical at the contract's 100 cluster tokens; torch
    topk (and ``lax.top_k``) both reject k > T, which the reference never
    hits because its stores always carry 100 tokens.  ``tokens`` None or
    falsy means the contract default."""
    t = tokens or 100
    return tuple(k for k in HE2RNAConfig.ks if k <= t) or (1,)


def init(cfg: HE2RNAConfig, key: jax.Array, dtype=jnp.float32,
         bias_init=None) -> Params:
    """``bias_init``: optional (G,) vector for the output layer's bias
    (reference HE2RNA ctor's ``bias_init``, used to seed the head with mean
    expression values)."""
    dims = (cfg.input_dim,) + tuple(cfg.layers) + (cfg.output_dim,)
    ws, bs = [], []
    for k, (din, dout) in zip(jax.random.split(key, len(dims) - 1),
                              zip(dims[:-1], dims[1:])):
        w, b = torch_init.linear_params(k, din, dout, dtype)
        ws.append(w)
        bs.append(b)
    if bias_init is not None:
        bs[-1] = jnp.asarray(bias_init, dtype)
    return {"w": ws, "b": bs}


def tile_scores(cfg: HE2RNAConfig, params: Params, x: jax.Array, *,
                train: bool = False, rng: jax.Array | None = None) -> jax.Array:
    """Per-tile gene scores: ``(B, T, D) -> (B, T, G)`` (pre-masking).

    Dropout (p=cfg.dropout) is applied after each hidden ReLU when
    ``train=True`` (torch ``model.train()`` semantics).
    """
    ws, bs = params["w"], params["b"]
    for i, (w, b) in enumerate(zip(ws[:-1], bs[:-1])):
        x = jax.nn.relu(linear(x, w, b))
        if train and cfg.dropout > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - cfg.dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)
    return linear(x, ws[-1], bs[-1])


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _topk_core(mt: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """(B, G, T) masked scores -> (B, G) top-k masked mean.

    Custom VJP: XLA's ``top_k`` gradient materializes an iota broadcast with
    a trailing size-1 dim whose (8,128) tile padding explodes to ~18 GB at
    the production shape (B=16, G=20820, T=100); the hand-written backward
    scatters ``g * mask[:k]/denom`` straight to the selected indices.
    """
    top = jax.lax.top_k(mt, k)[0]
    denom = jnp.sum(mask[:, :k], axis=1)
    num = jnp.sum(top * mask[:, None, :k], axis=2)
    # all-masked samples (zero-padded batch rows) predict 0 instead of 0/0
    # NaN (which would otherwise poison the masked loss and every gradient)
    return jnp.where(denom[:, None] > 0, num / jnp.maximum(denom[:, None], 1.0),
                     0.0)


def _topk_core_fwd(mt, mask, k):
    vals, idx = jax.lax.top_k(mt, k)
    denom = jnp.sum(mask[:, :k], axis=1)
    num = jnp.sum(vals * mask[:, None, :k], axis=2)
    out = jnp.where(denom[:, None] > 0, num / jnp.maximum(denom[:, None], 1.0),
                    0.0)
    return out, (idx, mask, denom, mt.shape)


def _topk_core_bwd(k, res, g):
    idx, mask, denom, shape = res
    b, gdim, t = shape
    safe = jnp.maximum(denom, 1.0)
    w = jnp.where(denom[:, None, None] > 0,
                  mask[:, None, :k] / safe[:, None, None], 0.0)
    upd = g[:, :, None] * w  # (B, G, k)
    # scatter expressed as a one-hot contraction: TPU scatter-add runs at
    # ~0.1 G-updates/s here (377 ms at this shape) while XLA fuses the
    # one-hot into a batched GEMM (10 ms, never materialized)
    onehot = jax.nn.one_hot(idx, t, dtype=g.dtype)  # (B, G, k, T)
    # HIGHEST precision for f32 operands (ops/nn.py policy): the TPU
    # default would round f32 gradients through bf16 multiplier passes
    dmt = jnp.einsum("bgjt,bgj->bgt", onehot, upd,
                     precision=matmul_precision(g),
                     preferred_element_type=jnp.float32).astype(g.dtype)
    return dmt, jnp.zeros_like(mask)


_topk_core.defvjp(_topk_core_fwd, _topk_core_bwd)


def _topk_masked_mean(scores: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """Reference ``forward_fixed_k``: top-k over tiles of masked scores,
    normalized by the mask count of the first ``k`` tiles."""
    masked = scores * mask[:, :, None]  # (B, T, G)
    return _topk_core(masked.transpose(0, 2, 1), mask, k)


def apply(cfg: HE2RNAConfig, params: Params, x: jax.Array, *,
          train: bool = False, rng: jax.Array | None = None) -> jax.Array:
    """Forward pass: ``(B, T, D)`` tile features -> ``(B, G)``.

    In training mode ``rng`` drives both the dropout masks and the random
    choice of ``k`` (reference ``forward``: ``np.random.choice(self.ks)``).
    """
    mask = (jnp.max(x, axis=2) > 0).astype(scores_dtype(x))  # (B, T)
    if train:
        rng, kkey, dkey = jax.random.split(rng, 3)
        scores = tile_scores(cfg, params, x, train=True, rng=dkey)
        idx = jax.random.randint(kkey, (), 0, len(cfg.ks))
        branches = [lambda s=scores, m=mask, k=int(k): _topk_masked_mean(s, m, k)
                    for k in cfg.ks]
        return jax.lax.switch(idx, branches)
    scores = tile_scores(cfg, params, x, train=False)
    pred = jnp.zeros(scores.shape[::2], scores.dtype)
    for k in cfg.ks:
        pred = pred + _topk_masked_mean(scores, mask, int(k)) / len(cfg.ks)
    return pred


def scores_dtype(x: jax.Array):
    return jnp.float32 if x.dtype == jnp.float32 else x.dtype


def slice_head(cfg: HE2RNAConfig, params: Params,
               indices) -> tuple[HE2RNAConfig, Params]:
    """Restrict the final 1x1-conv layer to a gene panel.  Sound because
    the top-k masked mean is per-gene independent (``_topk_core`` top-ks
    over the tile axis for each gene separately), so output selection
    commutes with the whole eval forward."""
    from sequoia_tpu.ops.nn import slice_linear_outputs

    new = {"w": list(params["w"]), "b": list(params["b"])}
    new["w"][-1], new["b"][-1], n = slice_linear_outputs(
        params["w"][-1], params["b"][-1], indices, cfg.output_dim)
    return dataclasses.replace(cfg, output_dim=n), new


def replace_head(cfg: HE2RNAConfig, params: Params, num_outputs: int,
                 key: jax.Array) -> tuple[HE2RNAConfig, Params]:
    """Swap the final layer (GTEx->TCGA transfer, reference he2rna.py:403-409)."""
    fan_in = cfg.layers[-1] if cfg.layers else cfg.input_dim
    w, b = torch_init.linear_params(key, fan_in, num_outputs,
                                    params["w"][-1].dtype)
    new = {"w": list(params["w"]), "b": list(params["b"])}
    new["w"][-1] = w
    new["b"][-1] = b
    return dataclasses.replace(cfg, output_dim=num_outputs), new
