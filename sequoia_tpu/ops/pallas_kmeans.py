"""Pallas TPU kernel for the k-means Lloyd inner step.

One Lloyd iteration needs, per point-tile: squared distances to all centers
(an MXU GEMM), the argmin assignment, and the per-cluster count/sum
accumulation (a second GEMM against the one-hot assignment).  The XLA path
(ops/kmeans.py) materializes the (N, k) distances and the (N, k) one-hot in
HBM between those steps; this kernel keeps everything for a tile in VMEM:

    grid over point tiles (TN, D):
      d2      = x2 + |c|^2 - 2 x @ c^T        (MXU, f32 accumulate)
      labels  = argmin(d2)                     (VPU)
      onehot  = labels == iota                 (VPU, VMEM only)
      counts += sum(onehot)                    (accumulated in VMEM scratch)
      sums   += onehot^T @ x                   (MXU, accumulated in VMEM)
      inertia+= sum(min d2 * mask)

Outputs (sums (k, D), counts (k,), inertia) feed the center update +
empty-cluster relocation exactly as in the XLA path.  Masked (padded) rows
contribute nothing.  k and D must be padded to lane multiples by the caller
(``lloyd_stats`` handles it).

Measured on v5e (4096x2048 points, k=100): XLA 6.3 ms/fit vs Pallas
7.7 ms/fit — XLA already fuses this chain well and the kernel pays for the
k->128 sentinel padding, so the XLA path stays the default
(``kmeans_fit(use_pallas=False)``); the kernel remains as the building
block for larger-k / fused-multi-slide variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lloyd_kernel(x_ref, mask_ref, c_ref, c2_ref,
                  sums_ref, counts_ref, inertia_ref, best_ref,
                  acc_sums, acc_counts, acc_inertia):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_sums[:] = jnp.zeros_like(acc_sums)
        acc_counts[:] = jnp.zeros_like(acc_counts)
        acc_inertia[:] = jnp.zeros_like(acc_inertia)

    x = x_ref[:]                       # (TN, D)
    maskf = mask_ref[:]                # (TN, 1) f32 1/0
    c = c_ref[:]                       # (K, D)
    c2 = c2_ref[:]                     # (1, K)

    x2 = jnp.sum(x * x, axis=1, keepdims=True)              # (TN, 1)
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)  # (TN, K) MXU
    d2 = jnp.maximum(x2 + c2 - 2.0 * xc, 0.0)

    labels = jnp.argmin(d2, axis=1)                          # (TN,)
    k = c.shape[0]
    onehot = (labels[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1))
    onehot = onehot.astype(jnp.float32) * maskf              # (TN, K)

    acc_counts[:] += jnp.sum(onehot, axis=0, keepdims=True)  # (1, K)
    acc_sums[:] += jnp.dot(onehot.T, x,
                           preferred_element_type=jnp.float32)  # (K, D) MXU
    best = jnp.min(d2, axis=1, keepdims=True) * maskf        # (TN, 1)
    best_ref[:] = best
    acc_inertia[:] = acc_inertia[:] + jnp.sum(best).reshape(1, 1)

    @pl.when(i == n_tiles - 1)
    def _emit():
        sums_ref[:] = acc_sums[:]
        counts_ref[:] = acc_counts[:]
        inertia_ref[:] = acc_inertia[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def lloyd_stats(x: jax.Array, mask: jax.Array, centers: jax.Array,
                *, tile_n: int = 512, interpret: bool = False):
    """One fused Lloyd accumulation pass.

    x (N, D) f32, mask (N,) bool, centers (K, D) f32; N % tile_n == 0 and
    K, D lane-aligned give the best layout (the caller pads).
    Returns (sums (K, D), counts (K,), inertia ()).
    """
    n, d = x.shape
    k = centers.shape[0]
    assert n % tile_n == 0, (n, tile_n)
    c2 = jnp.sum(centers * centers, axis=1)[None, :]  # (1, K)
    maskf = mask.astype(jnp.float32)[:, None]         # (N, 1)

    grid = (n // tile_n,)
    sums, counts, inertia, best = pl.pallas_call(
        _lloyd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, d), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, maskf, centers, c2)
    return sums, counts[0], inertia[0, 0], best[:, 0]
