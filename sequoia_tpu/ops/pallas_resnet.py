"""Fused ResNet bottleneck-chain Pallas kernel for the early stages.

Why: at 256px patches the backbone spends most of its time in layer1/layer2
(C=64/128), where XLA's conv lowering pads the 64-channel axis to 128 lanes
and round-trips HBM between every conv — measured ~10% MFU on the layer1
1x1-3x3-1x1 chain (WORKLOG round 1).  This kernel runs a whole run of
stride-1 bottleneck blocks per image with every intermediate VMEM-resident:

* activations live as (P, C) — pixels on sublanes, channels on lanes — the
  natural flattening of NHWC, so entering/leaving the kernel is a reshape,
  never a transpose;
* each 1x1 conv is one (P, Cin) @ (Cin, Cout) GEMM;
* the 3x3 conv is the nine-tap shift decomposition: the taps of a padded
  SAME conv are row-shifted slices of a zero-padded (P + 2W, C) buffer,
  concatenated into a (R, 9C) tile and contracted against the reshaped
  (9C, C) kernel in ONE MXU GEMM (K = 9C = 576/1152 keeps the MXU full
  where per-tap GEMMs would run at K=64);
* folded eval-BN (scale/bias), ReLU, and the residual add are VPU ops on
  the GEMM outputs; f32 accumulation throughout.

Covers the stride-1 runs: all of layer1 (its block-0 projection shortcut is
stride 1) and the tails of layer2-4.  Stride-2 transition blocks stay on the
XLA path (models/resnet.py:_bottleneck).

Behavioral contract: bit-compatible (to f32-accumulation rounding) with the
reference's torchvision bottleneck stack (reference ``src/resnet.py:57-94``),
validated against the XLA path in tests/test_pallas_resnet.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tap order must match the (3, 3, C, C) HWIO kernel reshape to (9C, C):
# rows are (dy, dx, cin) in lexicographic order.
TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def fold_block_weights(blk: dict, dtype) -> tuple:
    """Our resnet block pytree (models/resnet.py layout: HWIO convs +
    folded-BN scale/bias) -> flat kernel-layout arrays.

    The BN per-channel scale folds into the conv weight columns (conv is
    linear), leaving one bias add per conv.  For projection-shortcut blocks
    conv3 and the downsample conv merge into a single (width + cin, cout)
    GEMM over concat(y2, x) — K doubles, halving MXU passes.

    Returns (w1, b1, w2s, b2, w3[d], b3[d]) — w3d rows are [conv3-scaled;
    downsample-scaled] when the block has a projection shortcut.
    """
    def fold(w, bnp, c):
        s = bnp["scale"].reshape(1, c).astype(jnp.float32)
        b = bnp["bias"].reshape(1, c).astype(jnp.float32)
        return (w.astype(jnp.float32) * s).astype(dtype), b

    cin = blk["conv1"].shape[2]
    width = blk["conv1"].shape[3]
    cout = blk["conv3"].shape[3]
    w1, b1 = fold(blk["conv1"].reshape(cin, width), blk["bn1"], width)
    w2s, b2 = fold(blk["conv2"].reshape(9 * width, width), blk["bn2"], width)
    w3, b3 = fold(blk["conv3"].reshape(width, cout), blk["bn3"], cout)
    if "downsample_conv" in blk:
        wd, bd = fold(blk["downsample_conv"].reshape(cin, cout),
                      blk["downsample_bn"], cout)
        return (w1, b1, w2s, b2,
                jnp.concatenate([w3, wd], axis=0), b3 + bd)
    return (w1, b1, w2s, b2, w3, b3)


def chain_meta(blocks: list[dict]) -> tuple:
    """Static per-block shape/shortcut description for the kernel closure."""
    meta = []
    for blk in blocks:
        meta.append((int(blk["conv1"].shape[2]), int(blk["conv1"].shape[3]),
                     int(blk["conv3"].shape[3]), "downsample_conv" in blk))
    return tuple(meta)


def _dot(a, b):
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None)
    return jnp.dot(a, b, precision=prec, preferred_element_type=jnp.float32)


def _chain_kernel(meta, H, W, R, cdtype, x_ref, *refs):
    """One image per grid step: runs every block of the chain VMEM-resident."""
    t_ref = refs[-1]      # (P + 2*pad, 3*width) column-shifted triple
    stack_ref = refs[-2]  # (R, 9*width) tap stack for the conv2 GEMM
    o_ref = refs[-3]
    w_refs = refs[:-3]
    P = H * W
    pad = W + 8  # the (dy=+-1, dx=+-1) taps reach one element past +-W
    PT = P + 2 * pad

    # dx-validity masks in T coordinates: T row q holds image row (q - pad),
    # whose column is (q - pad) % W == (q + W - 8) % W
    qcol = (jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0) + (W - 8)) % W
    tmasks = {-1: (qcol != 0), 0: None, 1: (qcol != W - 1)}

    x = x_ref[0]  # (P, Cin0)
    wi = 0

    def take(n):
        nonlocal wi
        out = tuple(r[:] for r in w_refs[wi:wi + n])
        wi += n
        return out

    for cin, width, cout, has_ds in meta:
        w1, b1, w2s, b2, w3, b3 = take(6)

        # 1x1 reduce over the full image, then zero-pad rows for the taps
        y1 = jnp.maximum(_dot(x, w1) + b1, 0.0).astype(cdtype)
        zpad = jnp.zeros((pad + 1, width), cdtype)
        y1p = jnp.concatenate([zpad, y1, zpad], axis=0)  # (PT + 2, width)

        # column-shifted triple, built ONCE per block: T[q, j*w:] holds the
        # dx = j-1 shift of y1, masked at image row boundaries.  The 9 taps
        # then become three dy*W-aligned row slices of T — the only
        # unaligned (+-1) slices happen here, 3 per block instead of 9 per
        # chunk (unaligned sublane slices cost a VPU relayout each).
        for j, dx in enumerate((-1, 0, 1)):
            seg = jax.lax.slice_in_dim(y1p, 1 + dx, 1 + dx + PT, axis=0)
            if tmasks[dx] is not None:
                seg = jnp.where(tmasks[dx], seg, 0)
            t_ref[:, j * width:(j + 1) * width] = seg

        chunks = []
        for p0 in range(0, P, R):
            for k, dy in enumerate((-1, 0, 1)):
                stack_ref[:, k * 3 * width:(k + 1) * 3 * width] = \
                    t_ref[pad + p0 + dy * W: pad + p0 + dy * W + R, :]
            y2 = jnp.maximum(_dot(stack_ref[:], w2s) + b2, 0.0).astype(cdtype)
            xc = jax.lax.slice_in_dim(x, p0, p0 + R, axis=0)
            if has_ds:  # conv3 and projection shortcut as ONE GEMM
                y3 = _dot(jnp.concatenate([y2, xc], axis=1), w3) + b3
            else:
                y3 = _dot(y2, w3) + b3 + xc.astype(jnp.float32)
            chunks.append(jnp.maximum(y3, 0.0).astype(cdtype))
        x = jnp.concatenate(chunks, axis=0)                  # (P, cout)

    o_ref[0] = x


@functools.partial(jax.jit,
                   static_argnames=("meta", "H", "W", "row_chunk", "interpret"))
def bottleneck_chain(x: jax.Array, flat_weights: tuple, *, meta: tuple,
                     H: int, W: int, row_chunk: int = 512,
                     interpret: bool = False) -> jax.Array:
    """(B, H*W, Cin) -> (B, H*W, Cout) through a run of stride-1 bottleneck
    blocks (``meta`` from :func:`chain_meta`, ``flat_weights`` the
    concatenation of :func:`fold_block_weights` per block)."""
    B, P, cin = x.shape
    assert P == H * W, (P, H, W)
    R = min(row_chunk, P)
    assert P % R == 0 and R % W == 0, (P, R, W)
    cout = meta[-1][2]
    widths = {m[1] for m in meta}
    assert len(widths) == 1, f"chain requires a uniform width, got {widths}"
    width = next(iter(widths))

    kernel = functools.partial(_chain_kernel, meta, H, W, R, x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, P, cout), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, P, cin), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, (lambda b: (0,) * w.ndim),
                        memory_space=pltpu.VMEM) for w in flat_weights],
        out_specs=pl.BlockSpec((1, P, cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, 9 * width), x.dtype),
                        pltpu.VMEM((P + 2 * (W + 8), 3 * width), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * sum(ci * w + 9 * w * w + w * co
                                  + (ci * co if ds else 0)
                                  for ci, w, co, ds in meta),
            bytes_accessed=x.size * x.dtype.itemsize
            + B * P * cout * x.dtype.itemsize
            + sum(w.size * w.dtype.itemsize for w in flat_weights),
            transcendentals=0),
        interpret=interpret,
    )(x, *flat_weights)


def stage_chain_weights(blocks: list[dict], start: int, dtype):
    """Fold blocks[start:] of a stage into (flat_weights, meta)."""
    flat: list = []
    for blk in blocks[start:]:
        flat.extend(fold_block_weights(blk, dtype))
    return tuple(flat), chain_meta(blocks[start:])
