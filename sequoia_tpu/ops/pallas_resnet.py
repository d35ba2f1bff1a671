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


# ---------------------------------------------------------------------------
# (C, P) layout kernels — channels on SUBLANES, pixels on LANES.
#
# Why a second layout: in the (P, C) kernel above, every GEMM has the
# channel axis (64 for layer1) as its N dimension, so at most 64 of the
# MXU's 128 output columns are ever live — a hard ~50% ceiling that matches
# the measured wash vs XLA.  Flipping to (C, P) puts the huge pixel axis on
# N (always full) and the contracted axis on real channel counts:
# the 3x3 becomes a (width, 9*width) @ (9*width, P) GEMM with K=576 and the
# projection shortcut merges to K=128 — both MXU-saturating.  Lane rolls
# (pltpu.roll) implement the 9 spatial taps, with iota masks zeroing the
# row/column wraparound.
#
# The same trick fixes the stem: the 7x7/s2 conv, already folded to a
# 4x4/s1 conv over space-to-depth(2) inputs (models/resnet.py), lowers in
# XLA to K=12 GEMMs (<10% MXU — the stem measured 2.4 ms of a 14 ms
# forward).  Here its 16 taps stack into one (64, 192) @ (192, P) GEMM.
# ---------------------------------------------------------------------------


def _shift_mask(P: int, W: int, dy: int, dx: int):
    """Lane mask: position q (row-major y*W+x) may read source q + dy*W + dx.

    Valid iff the column stays in [0, W) and the source row stays in the
    image, which given a valid column is exactly 0 <= q + dy*W + dx < P.
    """
    q = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    col = q % W
    ok = (col + dx >= 0) & (col + dx < W)
    s = q + dy * W + dx
    return ok & (s >= 0) & (s < P)


def _shifted(y, P, W, dy, dx):
    """y[:, q + dy*W + dx] at lane q, zero outside the image (y: (C, P))."""
    d = dy * W + dx
    if d == 0:
        rolled = y
    elif y.dtype.itemsize == 4:
        rolled = pltpu.roll(y, (-d) % P, axis=1)
    else:
        # Mosaic's lane rotate is 32-bit only: round-trip through f32
        rolled = pltpu.roll(y.astype(jnp.float32), (-d) % P,
                            axis=1).astype(y.dtype)
    return jnp.where(_shift_mask(P, W, dy, dx), rolled, 0)


def fold_stem16_weights(w_s2d: jax.Array, bn1: dict, dtype) -> tuple:
    """(4, 4, 12, 64) space-to-depth stem kernel + folded BN ->
    (A (64, 256), b (64, 1)) for the tap-stack GEMM.  A's 16 column groups
    of 16 are the (ky, kx) taps; within a group the first 12 columns carry
    the scaled cin weights and the last 4 are zero — the kernel pads the
    12 s2d input channels to a 16-sublane tile, and K=192 would occupy the
    same two 128-deep MXU passes as K=256, so the padding is free."""
    scale = bn1["scale"].astype(jnp.float32)
    a = w_s2d.astype(jnp.float32) * scale  # (4, 4, 12, 64)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, 4), (0, 0)))
    return (a.reshape(256, 64).T.astype(dtype),
            bn1["bias"].astype(jnp.float32).reshape(64, 1))


def _stem16_kernel(W2, P_out, cdtype, x_ref, a_ref, b_ref, o_ref, stack_ref):
    """Tap stack built in-kernel: the four dy (row) shifts are whole-row
    lane offsets into the row-padded input (ky*W2, a multiple of the
    128-lane tile when W2 % 128 == 0 — plain re-addressed loads), and the
    four dx (column) shifts are small lane rolls masked at the row edges.
    One (64, 256) @ (256, P_out) GEMM finishes the conv+bn, then ReLU."""
    for ky in range(4):
        base = x_ref[0, :, ky * W2:ky * W2 + P_out]  # (16, P_out)
        base32 = base if base.dtype.itemsize == 4 else base.astype(jnp.float32)
        for kx, dx in enumerate((-2, -1, 0, 1)):
            if dx == 0:
                shifted = base
            else:
                rolled = pltpu.roll(base32, (-dx) % P_out, axis=1)
                shifted = jnp.where(_shift_mask(P_out, W2, 0, dx),
                                    rolled, 0).astype(base.dtype)
            t = ky * 4 + kx
            stack_ref[t * 16:(t + 1) * 16, :] = shifted
    y = _dot(a_ref[:], stack_ref[:]) + b_ref[:]
    o_ref[0] = jnp.maximum(y, 0.0).astype(cdtype)


@functools.partial(jax.jit, static_argnames=("H2", "W2", "interpret"))
def stem16(x16: jax.Array, a: jax.Array, b: jax.Array, *, H2: int, W2: int,
           interpret: bool = False) -> jax.Array:
    """(B, 16, (H2+3)*W2) input -> (B, 64, H2*W2) stem activations
    (conv+bn+relu).

    The 16 channels are the 12 space-to-depth channels padded with 4 zero
    channels (sublane-tile alignment), and the H2+3 rows carry 2 top /
    1 bottom zero pad rows so the kernel's four dy shifts are plain lane
    offsets.  W2 must be a multiple of 128 (lane-tile alignment)."""
    B, c16, P_in = x16.shape
    assert c16 == 16 and P_in == (H2 + 3) * W2
    assert W2 % 128 == 0 or interpret, "lane alignment needs W2 % 128 == 0"
    P_out = H2 * W2
    kernel = functools.partial(_stem16_kernel, W2, P_out, x16.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 64, P_out), x16.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, c16, P_in), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(b.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, P_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, P_out), x16.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 64 * 256 * P_out,
            bytes_accessed=(x16.size + B * 64 * P_out) * x16.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x16, a, b)


def fold_block_weights_cp(blk: dict, dtype) -> tuple:
    """Like :func:`fold_block_weights` but in (C_out, K) orientation for the
    (C, P) kernels: GEMMs are w @ x with x (K, P)."""
    def fold(w_t, bnp, c):
        # w_t: (K, c) math layout; scale the OUTPUT channels (columns), then
        # transpose to (c, K)
        s = bnp["scale"].reshape(1, c).astype(jnp.float32)
        w = (w_t.astype(jnp.float32) * s).T.astype(dtype)
        return w, bnp["bias"].astype(jnp.float32).reshape(c, 1)

    cin = blk["conv1"].shape[2]
    width = blk["conv1"].shape[3]
    cout = blk["conv3"].shape[3]
    w1, b1 = fold(blk["conv1"].reshape(cin, width), blk["bn1"], width)
    # conv2 stack columns are (tap, cin) to match the kernel's stack rows
    w2, b2 = fold(blk["conv2"].reshape(9 * width, width), blk["bn2"], width)
    w3, b3 = fold(blk["conv3"].reshape(width, cout), blk["bn3"], cout)
    if "downsample_conv" in blk:
        wd, bd = fold(blk["downsample_conv"].reshape(cin, cout),
                      blk["downsample_bn"], cout)
        return (w1, b1, w2, b2, jnp.concatenate([w3, wd], axis=1), b3 + bd)
    return (w1, b1, w2, b2, w3, b3)


def _chain_cp_kernel(meta, H, W, cdtype, x_ref, *refs):
    stack_ref = refs[-1]  # (9*width, P)
    o_ref = refs[-2]
    w_refs = refs[:-2]
    P = H * W
    x = x_ref[0]  # (Cin0, P)
    wi = 0

    def take(n):
        nonlocal wi
        out = tuple(r[:] for r in w_refs[wi:wi + n])
        wi += n
        return out

    for cin, width, cout, has_ds in meta:
        w1, b1, w2, b2, w3, b3 = take(6)
        y1 = jnp.maximum(_dot(w1, x) + b1, 0.0).astype(cdtype)
        for t, (dy, dx) in enumerate(TAPS):
            stack_ref[t * width:(t + 1) * width, :] = _shifted(
                y1, P, W, dy, dx)
        y2 = jnp.maximum(_dot(w2, stack_ref[:]) + b2, 0.0).astype(cdtype)
        if has_ds:  # conv3 + projection shortcut as ONE K=(width+cin) GEMM
            y3 = _dot(w3, jnp.concatenate([y2, x], axis=0)) + b3
        else:
            y3 = _dot(w3, y2) + b3 + x.astype(jnp.float32)
        x = jnp.maximum(y3, 0.0).astype(cdtype)

    o_ref[0] = x


@functools.partial(jax.jit, static_argnames=("meta", "H", "W", "interpret"))
def bottleneck_chain_cp(x: jax.Array, flat_weights: tuple, *, meta: tuple,
                        H: int, W: int, interpret: bool = False) -> jax.Array:
    """(B, Cin, H*W) -> (B, Cout, H*W) through stride-1 bottleneck blocks,
    channels-on-sublanes layout (weights from :func:`fold_block_weights_cp`,
    ``meta`` from :func:`chain_meta`)."""
    B, cin, P = x.shape
    assert P == H * W, (P, H, W)
    cout = meta[-1][2]
    widths = {m[1] for m in meta}
    assert len(widths) == 1, f"chain requires a uniform width, got {widths}"
    width = next(iter(widths))

    kernel = functools.partial(_chain_cp_kernel, meta, H, W, x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, cout, P), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, cin, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, (lambda b, nd=w.ndim: (0,) * nd),
                        memory_space=pltpu.VMEM) for w in flat_weights],
        out_specs=pl.BlockSpec((1, cout, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((9 * width, P), x.dtype)],
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


def stage_chain_weights_cp(blocks: list[dict], start: int, dtype):
    """Fold blocks[start:] of a stage into (flat_weights, meta), (C, P)
    orientation."""
    flat: list = []
    for blk in blocks[start:]:
        flat.extend(fold_block_weights_cp(blk, dtype))
    return tuple(flat), chain_meta(blocks[start:])
