"""Mesh + sharding layout for data/model-parallel training over ICI.

The SEQUOIA aggregators are small (tens of M params) over a 100-token
sequence, so the scaling axes that matter are:

* ``data``: batch (slides) — the workhorse axis for training and for the
  feature-extraction/k-means stages (thousands of patches per slide).
* ``model``: the gene dimension of the output head.  With the full 20,820
  gene panel the ``(D, G)`` head + its AdamW state is the single largest
  tensor family; sharding G over ``model`` spreads it and its (B, G) target
  matmuls across chips.

Everything else is replicated — XLA GSPMD inserts the gradient psum for the
replicated params automatically when batch inputs are sharded over ``data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    s = _named(mesh, P())
    return jax.device_put(tree, s)


def param_pspecs(params) -> dict:
    """PartitionSpecs for a ViS/ViT param pytree: head sharded over 'model'
    on the gene axis, everything else replicated."""
    specs = jax.tree.map(lambda _: P(), params)
    if isinstance(params, dict) and "head_w" in params:
        specs["head_w"] = P(None, "model")
        specs["head_b"] = P("model")
    return specs


def shard_params(mesh: Mesh, params):
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, _named(mesh, s)), params, specs)


def opt_state_pspecs(opt_state, params):
    """PartitionSpecs for an optax state: any subtree that mirrors the param
    pytree (AdamW's ``mu``/``nu`` moments) inherits :func:`param_pspecs`;
    everything else (step counts, empty states) is replicated.

    This keeps the (D, G) gene-head moments sharded over 'model' with the
    head itself — replicating them would all-gather ~340 MB of AdamW state
    per chip at the full 20,820-gene panel, defeating the head TP."""
    pstruct = jax.tree.structure(params)
    pspecs = param_pspecs(params)

    def is_param_like(sub):
        try:
            return jax.tree.structure(sub) == pstruct
        except Exception:
            return False

    def spec_for(sub):
        if is_param_like(sub):
            return pspecs
        return jax.tree.map(lambda _: P(), sub)

    return jax.tree.map(spec_for, opt_state, is_leaf=is_param_like)


def shard_opt_state(mesh: Mesh, opt_state, params):
    """Place optimizer state on the mesh with moments sharded like params."""
    specs = opt_state_pspecs(opt_state, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, _named(mesh, s)), opt_state, specs)


def shard_batch_arrays(mesh: Mesh, features, rna, valid):
    """features (B,T,D) and valid (B,) over 'data'; rna (B,G) over
    ('data','model') to co-locate targets with the sharded head output."""
    return (jax.device_put(features, _named(mesh, P("data"))),
            jax.device_put(rna, _named(mesh, P("data", "model"))),
            jax.device_put(valid, _named(mesh, P("data"))))


def shard_array(mesh: Mesh, x, spec: P):
    """Place one array with a PartitionSpec on the mesh."""
    return jax.device_put(x, _named(mesh, spec))


def dp_images(mesh: Mesh, images):
    """Shard an image/patch batch over the 'data' axis — the multi-chip
    layout for the feature-extraction stage (each chip runs the backbone on
    its batch shard; no collectives needed until aggregation)."""
    return shard_array(mesh, images, P("data"))
