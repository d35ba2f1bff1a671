"""ViT — the quadratic softmax-attention benchmark aggregator.

Behavior contract (reference ``src/vit.py:37-115``, a lucidrains simple-ViT
derivative): learned 1-D positional embedding over ``num_clusters`` tokens,
``depth`` pre-LN blocks of multi-head softmax attention (qkv and output
projections WITHOUT bias) + pre-LN FeedForward, token mean-pool, LN + Linear
head.  Attention scale is ``dim_head ** -0.5``.

TPU-first: qkv is one fused ``(D, 3*H*dh)`` GEMM; attention is the standard
batched einsum form XLA maps straight onto the MXU (N=100 tokens — flash
attention machinery would be overhead here, the whole score matrix is tiny);
blocks are stacked and scanned like in ``vis.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from sequoia_tpu.ops.nn import einsum, gelu, layer_norm, linear
from sequoia_tpu.utils import torch_init

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Defaults = reference ``src/main.py:141-143`` (dim set per feature type).

    ``compute_dtype``: None = f32 parity path; "bfloat16" = fast path with
    f32 accumulation and f32 LayerNorm/softmax/head (same policy as ViS).
    """

    num_outputs: int
    dim: int
    depth: int = 6
    heads: int = 16
    dim_head: int = 64
    mlp_dim: int = 2048
    num_clusters: int = 100
    compute_dtype: str | None = None

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head


def init(cfg: ViTConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    d, inner = cfg.dim, cfg.inner_dim
    keys = iter(jax.random.split(key, 8))

    def stack(key, n, fan_in, fan_out, bias=True):
        ws, bs = [], []
        for k in jax.random.split(key, n):
            w, b = torch_init.linear_params(k, fan_in, fan_out, dtype)
            ws.append(w)
            bs.append(b)
        return (jnp.stack(ws), jnp.stack(bs)) if bias else jnp.stack(ws)

    blocks: dict[str, jax.Array] = {
        "ln_attn_scale": jnp.ones((cfg.depth, d), dtype),
        "ln_attn_bias": jnp.zeros((cfg.depth, d), dtype),
        # torch: to_qkv / to_out are bias-free Linears (vit.py:59-60).
        "w_qkv": stack(next(keys), cfg.depth, d, 3 * inner, bias=False),
        "w_out": stack(next(keys), cfg.depth, inner, d, bias=False),
        "ln_ff_scale": jnp.ones((cfg.depth, d), dtype),
        "ln_ff_bias": jnp.zeros((cfg.depth, d), dtype),
    }
    blocks["w1"], blocks["b1"] = stack(next(keys), cfg.depth, d, cfg.mlp_dim)
    blocks["w2"], blocks["b2"] = stack(next(keys), cfg.depth, cfg.mlp_dim, d)

    head_w, head_b = torch_init.linear_params(next(keys), d, cfg.num_outputs, dtype)
    return {
        "pos_emb": torch_init.randn(next(keys), (cfg.num_clusters, d), dtype),
        "blocks": blocks,
        "head_ln_scale": jnp.ones((d,), dtype),
        "head_ln_bias": jnp.zeros((d,), dtype),
        "head_w": head_w,
        "head_b": head_b,
    }


def _block(cfg: ViTConfig, x: jax.Array, bp: dict[str, jax.Array]) -> jax.Array:
    b, n, d = x.shape
    h, dh = cfg.heads, cfg.dim_head

    y = layer_norm(x, bp["ln_attn_scale"], bp["ln_attn_bias"])
    qkv = linear(y, bp["w_qkv"])  # (B, N, 3*H*dh), torch chunk order [q|k|v]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

    scores = einsum("bhnd,bhmd->bhnm", q, k) * (dh ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = einsum("bhnm,bhmd->bhnd", attn, v).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    x = linear(out, bp["w_out"]) + x

    y = layer_norm(x, bp["ln_ff_scale"], bp["ln_ff_bias"])
    y = gelu(linear(y, bp["w1"], bp["b1"]))
    y = linear(y, bp["w2"], bp["b2"])
    return x + y


def apply(cfg: ViTConfig, params: Params, x: jax.Array) -> jax.Array:
    """Forward pass: ``(B, N, D)`` cluster features -> ``(B, G)`` predictions."""
    if cfg.compute_dtype is not None:
        x = x.astype(cfg.compute_dtype)
    x = x + params["pos_emb"].astype(x.dtype)

    def body(carry, bp):
        return _block(cfg, carry, bp), None

    # unroll for the same reason as vis.apply: the rolled scan's backward
    # pays per-iteration activation staging (measured there: -10% on the
    # full train step); depth is 6 at the reference shape, so the compile
    # cost is modest
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=True)
    x = jnp.mean(x.astype(jnp.float32), axis=1)
    x = layer_norm(x, params["head_ln_scale"], params["head_ln_bias"])
    return linear(x, params["head_w"], params["head_b"])


def slice_head(cfg: ViTConfig, params: Params,
               indices) -> tuple[ViTConfig, Params]:
    """Restrict the output head to a gene panel (see ``vis.slice_head``)."""
    from sequoia_tpu.ops.nn import slice_linear_outputs

    new = dict(params)
    new["head_w"], new["head_b"], n = slice_linear_outputs(
        params["head_w"], params["head_b"], indices, cfg.num_outputs)
    return dataclasses.replace(cfg, num_outputs=n), new


def replace_head(cfg: ViTConfig, params: Params, num_outputs: int,
                 key: jax.Array) -> tuple[ViTConfig, Params]:
    """Swap the LN+Linear output head (GTEx->TCGA transfer)."""
    d = cfg.dim
    dt = params["head_w"].dtype
    head_w, head_b = torch_init.linear_params(key, d, num_outputs, dt)
    new = dict(params)
    new["head_ln_scale"] = jnp.ones((d,), dt)
    new["head_ln_bias"] = jnp.zeros((d,), dt)
    new["head_w"], new["head_b"] = head_w, head_b
    return dataclasses.replace(cfg, num_outputs=num_outputs), new


def posemb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0,
                     dtype=jnp.float32) -> jax.Array:
    """2-D sin/cos positional embedding (reference ``src/vit.py``
    posemb_sincos_2d — present in the reference API, unused by its pipeline).
    Returns (h*w, dim)."""
    assert dim % 4 == 0, "feature dimension must be multiple of 4 for sincos emb"
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    omega = jnp.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    y = y.reshape(-1)[:, None] * omega[None, :]
    x = x.reshape(-1)[:, None] * omega[None, :]
    pe = jnp.concatenate([jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=1)
    return pe.astype(dtype)
