"""ViS — the SEQUOIA SummaryMixing ("linearized transformer") aggregator.

Behavior contract (reference ``src/tformer_lin.py:7-106``): the model maps a
bag of ``num_clusters`` per-slide cluster features ``(B, N, D)`` to ``(B, G)``
gene-expression predictions.  Per block (depth x):

  multi-head SummaryMixing  ->  +residual  ->  pre-LN FeedForward  ->  +residual

where each of ``H`` heads computes, from the *block input* ``x``:

  local   = GELU(LN(x @ Wf))                        # per-token, D -> df
  summary = GELU(LN(mean_tokens(x @ Ws)))           # one vector per slide, D -> ds
  head    = GELU(concat[local, summary@bcast] @ Wc) # (df+ds) -> dc

heads are concatenated and projected back to D.  Finally tokens are
mean-pooled and passed through LN + Linear to G genes.  All LayerNorms use
torch defaults (eps=1e-5, biased variance); GELU is the exact-erf variant.

TPU-first design (NOT a translation of the reference's ModuleList loops):

* All ``H`` heads' ``f``/``s`` projections are fused into two big GEMMs
  ``(D, H*df)`` / ``(D, H*ds)`` so the MXU sees one large matmul instead of
  16 skinny ones; per-head LayerNorm runs on the reshaped ``(..., H, df)``
  activation with per-head scale/bias of shape ``(H, df)``.
* The per-head combine ``c`` is a block-diagonal contraction expressed as
  ``einsum('bnhi,hio->bnho')`` — a single batched GEMM over heads.
* Blocks are stacked along a leading ``depth`` axis and driven by
  ``lax.scan``, so the compiled program has one block body regardless of
  depth (fast compiles, identical math).
* Everything is a pure function of an explicit parameter pytree — jittable,
  vmappable, and shardable with ``jax.sharding`` without ceremony.

Weight compatibility with the reference's released HF checkpoints
(``gevaertlab/sequoia-{cancer}-{fold}``) is provided by
``sequoia_tpu.models.convert.vis_from_torch`` which maps the torch module
names (``transformer.layers.{i}.{0}.mixers.{h}.{f,s,c,...}``) into this
stacked layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from sequoia_tpu.ops.nn import (einsum, gelu, layer_norm, linear,
                                slice_linear_outputs)
from sequoia_tpu.utils import torch_init

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViSConfig:
    """Architecture hyperparameters (defaults = reference ``src/main.py:144-147``).

    ``compute_dtype``: None keeps the f32 parity path (HIGHEST-precision
    matmuls); "bfloat16" runs blocks in bf16 with f32 accumulation and f32
    LayerNorm/head output — the training/serving fast path.
    """

    num_outputs: int
    input_dim: int
    depth: int = 6
    nheads: int = 16
    dim_f: int = 64
    dim_s: int = 64
    dim_c: int = 64
    num_clusters: int = 100
    compute_dtype: str | None = None

    @property
    def proj_in(self) -> int:
        return self.nheads * self.dim_c


def init(cfg: ViSConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Fresh parameters with torch-default init distributions."""
    d, h = cfg.input_dim, cfg.nheads
    keys = iter(jax.random.split(key, 16))

    def stack_linears(key, n, fan_in, fan_out):
        ws, bs = [], []
        for k in jax.random.split(key, n):
            w, b = torch_init.linear_params(k, fan_in, fan_out, dtype)
            ws.append(w)
            bs.append(b)
        return jnp.stack(ws), jnp.stack(bs)

    blocks: dict[str, jax.Array] = {}
    # Per-head f/s projections: draw each head independently (torch draws one
    # Linear per head), then fuse into (depth, D, H*df).
    wf, bf = stack_linears(next(keys), cfg.depth * h, d, cfg.dim_f)
    blocks["wf"] = wf.reshape(cfg.depth, h, d, cfg.dim_f).transpose(0, 2, 1, 3).reshape(cfg.depth, d, h * cfg.dim_f)
    blocks["bf"] = bf.reshape(cfg.depth, h * cfg.dim_f)
    ws, bs = stack_linears(next(keys), cfg.depth * h, d, cfg.dim_s)
    blocks["ws"] = ws.reshape(cfg.depth, h, d, cfg.dim_s).transpose(0, 2, 1, 3).reshape(cfg.depth, d, h * cfg.dim_s)
    blocks["bs"] = bs.reshape(cfg.depth, h * cfg.dim_s)
    wc, bc = stack_linears(next(keys), cfg.depth * h, cfg.dim_f + cfg.dim_s, cfg.dim_c)
    blocks["wc"] = wc.reshape(cfg.depth, h, cfg.dim_f + cfg.dim_s, cfg.dim_c)
    blocks["bc"] = bc.reshape(cfg.depth, h, cfg.dim_c)

    blocks["ln_f_scale"] = jnp.ones((cfg.depth, h, cfg.dim_f), dtype)
    blocks["ln_f_bias"] = jnp.zeros((cfg.depth, h, cfg.dim_f), dtype)
    blocks["ln_s_scale"] = jnp.ones((cfg.depth, h, cfg.dim_s), dtype)
    blocks["ln_s_bias"] = jnp.zeros((cfg.depth, h, cfg.dim_s), dtype)

    wp, bp = stack_linears(next(keys), cfg.depth, cfg.proj_in, d)
    blocks["wproj"], blocks["bproj"] = wp, bp

    blocks["ln_ff_scale"] = jnp.ones((cfg.depth, d), dtype)
    blocks["ln_ff_bias"] = jnp.zeros((cfg.depth, d), dtype)
    # FeedForward hidden dim == input_dim (reference SummaryTransformer ctor,
    # tformer_lin.py:71).
    w1, b1 = stack_linears(next(keys), cfg.depth, d, d)
    w2, b2 = stack_linears(next(keys), cfg.depth, d, d)
    blocks["w1"], blocks["b1"], blocks["w2"], blocks["b2"] = w1, b1, w2, b2

    head_w, head_b = torch_init.linear_params(next(keys), d, cfg.num_outputs, dtype)
    return {
        "pos_emb": torch_init.randn(next(keys), (cfg.num_clusters, d), dtype),
        "blocks": blocks,
        "head_ln_scale": jnp.ones((d,), dtype),
        "head_ln_bias": jnp.zeros((d,), dtype),
        "head_w": head_w,
        "head_b": head_b,
    }


def _block(cfg: ViSConfig, x: jax.Array, bp: dict[str, jax.Array]) -> jax.Array:
    b, n, d = x.shape
    h = cfg.nheads

    # Local branch: one fused GEMM for all heads, then per-head LN + GELU.
    local = linear(x, bp["wf"], bp["bf"]).reshape(b, n, h, cfg.dim_f)
    local = gelu(layer_norm(local, bp["ln_f_scale"], bp["ln_f_bias"]))

    # Summary branch: project, mean-pool over tokens, per-head LN + GELU,
    # broadcast back over tokens.
    summ = linear(x, bp["ws"], bp["bs"]).reshape(b, n, h, cfg.dim_s)
    summ = jnp.mean(summ, axis=1)  # (B, H, ds)
    summ = gelu(layer_norm(summ, bp["ln_s_scale"], bp["ln_s_bias"]))
    summ = jnp.broadcast_to(summ[:, None], (b, n, h, cfg.dim_s))

    # Per-head combine: block-diagonal GEMM over heads.
    cat = jnp.concatenate([local, summ], axis=-1)  # (B, N, H, df+ds)
    c = einsum("bnhi,hio->bnho", cat, bp["wc"]) + bp["bc"]
    c = gelu(c).astype(x.dtype)

    attn = linear(c.reshape(b, n, h * cfg.dim_c), bp["wproj"], bp["bproj"])
    x = attn + x

    y = layer_norm(x, bp["ln_ff_scale"], bp["ln_ff_bias"])
    y = gelu(linear(y, bp["w1"], bp["b1"]))
    y = linear(y, bp["w2"], bp["b2"])
    return x + y


def apply(cfg: ViSConfig, params: Params, x: jax.Array) -> jax.Array:
    """Forward pass: ``(B, N, D)`` cluster features -> ``(B, G)`` predictions."""
    if cfg.compute_dtype is not None:
        x = x.astype(cfg.compute_dtype)
    x = x + params["pos_emb"].astype(x.dtype)

    def body(carry, bp):
        return _block(cfg, carry, bp), None

    # unroll: the backward of a rolled scan re-stages per-iteration
    # activation saves/reloads; unrolling lets XLA schedule the whole
    # residual stream in place (measured on v5e at the production shape:
    # blocks fwd+bwd 12.95 -> 10.81 ms, full train step 17.2 -> 15.4 ms;
    # docs/BENCHMARKS.md "train-step close-out").  Param layout is
    # unchanged — still one stacked (depth, ...) pytree per tensor.
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=True)
    x = jnp.mean(x.astype(jnp.float32), axis=1)
    x = layer_norm(x, params["head_ln_scale"], params["head_ln_bias"])
    return linear(x, params["head_w"], params["head_b"])


def slice_head(cfg: ViSConfig, params: Params,
               indices) -> tuple[ViSConfig, Params]:
    """Restrict the output head to a gene panel: gather head columns.

    Serving optimization with no reference counterpart: B=1 ViS latency is
    dominated by reading the ``(D, 20820)`` head weight from HBM, so a
    P-gene panel cuts the dominant read by ``G/P`` — a linear head commutes
    with output selection, so kept-gene predictions equal slicing the full
    output (up to XLA matmul reduction order)."""
    new = dict(params)
    new["head_w"], new["head_b"], n = slice_linear_outputs(
        params["head_w"], params["head_b"], indices, cfg.num_outputs)
    return dataclasses.replace(cfg, num_outputs=n), new


def replace_head(cfg: ViSConfig, params: Params, num_outputs: int,
                 key: jax.Array) -> tuple[ViSConfig, Params]:
    """GTEx->TCGA transfer: swap the LN+Linear output head for a fresh one
    (reference ``src/main.py:155-157``)."""
    d = cfg.input_dim
    dt = params["head_w"].dtype  # keep the model's param dtype (a bf16
    # pytree must not silently grow an f32 head)
    head_w, head_b = torch_init.linear_params(key, d, num_outputs, dt)
    new = dict(params)
    new["head_ln_scale"] = jnp.ones((d,), dt)
    new["head_ln_bias"] = jnp.zeros((d,), dt)
    new["head_w"], new["head_b"] = head_w, head_b
    return dataclasses.replace(cfg, num_outputs=num_outputs), new
