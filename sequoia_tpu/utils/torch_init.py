"""Parameter initializers with torch-default distributions, in JAX.

The reference's "random model" significance null (reference ``src/main.py``
random-model evaluate, ``evaluation/predict_independent_dataset.py``) depends
on freshly-initialized models drawn from torch's default init distributions.
We reproduce those *distributions* (not torch's RNG stream — the null is
random by construction):

* ``nn.Linear`` / ``nn.Conv1d``: weight ~ kaiming_uniform(a=sqrt(5)) which
  reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias ~ same bound.
* ``nn.LayerNorm``: scale=1, bias=0.
* ``nn.Parameter(torch.randn(...))`` (the 1-D positional embedding): N(0, 1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_params(key: jax.Array, fan_in: int, fan_out: int,
                  dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """Weight (fan_in, fan_out) + bias (fan_out,) with torch Linear defaults."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return w, b


def layer_norm_params(dim, dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    shape = (dim,) if isinstance(dim, int) else tuple(dim)
    return jnp.ones(shape, dtype), jnp.zeros(shape, dtype)


def randn(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(key, shape, dtype)
