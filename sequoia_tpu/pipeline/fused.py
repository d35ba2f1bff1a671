"""Device-resident whole-slide program: patch pixels -> gene predictions
without any host round-trips.

The production stages (``pipeline.features`` -> ``pipeline.kmeans_stage`` ->
aggregator inference) interoperate through HDF5 files like the reference.
This module is the TPU-native fast path when intermediate artifacts aren't
needed:

    scan over patch batches -> backbone features (stays in HBM)
    -> kmeans++/Lloyd -> per-cluster mean features
    -> ViS forward -> (num_genes,) predictions

Patch features never leave the device.  The stages compile as separate jits
(one mega-program compiles far slower for no runtime win — intermediates
already stay in HBM between dispatches).  Used by ``bench.py`` and available
for serving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet, uni_vit, vis
from sequoia_tpu.ops import kmeans as km


def make_slide_program(backbone_params, vis_cfg: vis.ViSConfig, vis_params,
                       *, n_clusters: int = 100,
                       compute_dtype=jnp.bfloat16, backbone: str = "resnet"):
    """Returns ``run(patch_batches_u8, key) -> (num_genes,)`` jitted.

    ``patch_batches_u8``: (n_batches, B, H, W, 3) uint8; all-zero rows are
    treated as padding and masked out of clustering.
    ``backbone``: 'resnet' (2048-d) or 'uni' (bit-exact PIL 224 resize +
    ViT-L, 1024-d).
    """
    if backbone == "resnet":
        rcfg = resnet.ResNetConfig(compute_dtype=compute_dtype)

        def one_batch(u8):
            return resnet.extract_from_uint8(rcfg, backbone_params, u8)
    elif backbone == "uni":
        ucfg = uni_vit.UniViTConfig(compute_dtype=compute_dtype)

        def one_batch(u8):
            return uni_vit.extract_from_uint8(ucfg, backbone_params, u8)
    else:
        raise ValueError('backbone must be "resnet" or "uni"')

    @jax.jit
    def features(patch_batches_u8: jax.Array):
        def step(_, u8):
            # all-zero patches are padding (the docstring permits zero-
            # padded batches): mask them OUT of clustering rather than
            # letting backbone-of-zeros rows capture clusters
            valid = jnp.any(u8 != 0, axis=(1, 2, 3))
            return None, (one_batch(u8), valid)

        _, (feats, valid) = jax.lax.scan(step, None, patch_batches_u8)
        # (N, D) f32 + (N,) bool, stays in HBM
        return feats.reshape(-1, feats.shape[-1]), valid.reshape(-1)

    vis_fwd = jax.jit(lambda p, x: vis.apply(vis_cfg, p, x))

    # Stages are compiled separately (a single giant program compiles much
    # more slowly for no runtime win); intermediates never leave the device,
    # so the pipeline is still fully device-resident.
    def run(patch_batches_u8: jax.Array, key: jax.Array) -> jax.Array:
        feats, mask = features(patch_batches_u8)
        _, labels, _, _ = km.kmeans_fit(feats, mask, key,
                                        n_clusters=n_clusters)
        cf = km.cluster_means(feats, labels, mask, n_clusters=n_clusters)
        # fewer valid patches than clusters leaves NaN means: zero-pad like
        # serve.cluster (reference <100-token window semantics)
        cf = jnp.nan_to_num(cf)
        return vis_fwd(vis_params, cf[None])[0]

    return run
