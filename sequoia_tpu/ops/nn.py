"""Elementary NN ops with exact PyTorch numerics, written for XLA/TPU.

The reference models are built from torch ``nn.Linear`` / ``nn.LayerNorm`` /
``nn.GELU()`` (exact erf variant, torch's default). These helpers reproduce
that math bit-closely in f32 while keeping every matmul MXU-eligible
(``preferred_element_type`` pinned to f32 so bf16 inputs still accumulate in
f32).

Conventions
-----------
* Weights are stored in math layout ``(in_features, out_features)`` —
  transposed relative to torch's ``(out, in)`` — so that ``x @ w`` contracts
  on the last axis without a transpose in the compiled program.
* ``layer_norm`` uses biased variance and ``eps=1e-5`` (torch defaults).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def gelu(x: jax.Array) -> jax.Array:
    """Exact-erf GELU, matching ``torch.nn.GELU()``'s default."""
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = LN_EPS) -> jax.Array:
    """LayerNorm over the last axis with torch semantics (biased variance).

    ``scale``/``bias`` may carry extra leading axes (e.g. per-head ``(H, D)``
    normalizing an ``(..., H, D)`` activation) — they broadcast.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def matmul_precision(x: jax.Array) -> jax.lax.Precision:
    """f32 operands use HIGHEST precision so the TPU MXU doesn't silently
    round them to bf16 (the TPU default for f32 matmuls); bf16 operands take
    the fast path with f32 accumulation via ``preferred_element_type``."""
    return (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def accum_type(x: jax.Array):
    """Accumulation dtype request: f32 everywhere except low-precision
    operands on the CPU backend (its DotThunk lacks BF16xBF16=F32)."""
    if x.dtype == jnp.float32 or jax.default_backend() != "cpu":
        return jnp.float32
    return None


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """``x @ w (+ b)`` with f32 accumulation on the MXU.  Weights stored in
    f32 are cast down to match a low-precision activation dtype (bf16 fast
    path) so the MXU runs at full rate."""
    y = jnp.dot(x, w.astype(x.dtype), precision=matmul_precision(x),
                preferred_element_type=accum_type(x))
    if b is not None:
        y = y + b
    return y.astype(x.dtype) if x.dtype != jnp.float32 else y


def einsum(spec: str, *ops: jax.Array) -> jax.Array:
    """``jnp.einsum`` with the same precision policy as :func:`linear`."""
    dt = ops[0].dtype
    ops = tuple(o.astype(dt) for o in ops)
    return jnp.einsum(spec, *ops, precision=matmul_precision(ops[0]),
                      preferred_element_type=accum_type(ops[0]))


def slice_linear_outputs(w: jax.Array, b: jax.Array, indices,
                         num_outputs: int):
    """Gather output columns of a ``(fan_in, out)`` linear head for gene-
    panel serving: ``(w', b', n_panel)``.  Bounds are validated eagerly —
    XLA's gather CLAMPS out-of-range indices silently, which would return
    wrong genes without an error."""
    import numpy as np

    idx = np.asarray(indices, np.int32)
    if idx.ndim != 1 or idx.shape[0] == 0:
        raise ValueError("slice_head needs a non-empty 1-D index list")
    if (idx < 0).any() or (idx >= num_outputs).any():
        raise ValueError(f"slice_head indices out of range for "
                         f"num_outputs={num_outputs}")
    return w[:, idx], b[idx], int(idx.shape[0])
