"""Fused ViS aggregator forward as ONE Pallas TPU kernel (B=1 serving).

Why it exists / MEASURED VERDICT (v5e, live A/B, round 4): at serving
batch 1 the ViS blocks are tiny GEMMs (N=100 tokens x D=2048) whose cost
is entirely weight movement — ~178 MB of bf16 block weights stream from
HBM per forward while the activation is a 0.4 MB tile.  The standing
hypothesis (WORKLOG r1 item 5 / VERDICT r3 item 3) was that a fused
kernel — activation VMEM-resident for the whole stack, each block's
weights streamed as ONE ~33 MB double-buffered chunk, grid = (depth,) —
would beat XLA's per-op scan.  Measured on the chip with 32 chained
forwards per dispatch: **fused 1.068 ms vs XLA scan 1.066 ms — a wash.**
(A finer 48-step variant measured 1.48 ms; per-step overhead ate it.)
Two radically different schedules converging on the same 1.07 ms
(~167 GB/s effective weight rate) means the bound is the hardware's
weight-movement path at this working-set shape, not XLA scheduling —
so the kernel stays correctness-tested but is NOT wired into serving
(same policy as ops/pallas_resnet.py / pallas_kmeans.py), and the
fused-aggregator ambition is closed with a number.
docs/BENCHMARKS.md carries the A/B table.

Shape contract (production ViS, reference ``src/main.py:144-147``): the
fused projection widths must all equal P = H*df = H*ds = H*dc and the
model dim must be D = 2*P (2048 = 2*1024 in production) — checked by
:func:`supported`.  Token count N and depth are free.

Packed layout — every block's weights as a (16*P, P) ``dtype`` chunk of
row-stacked (., P) slabs (wide matrices stored as vertical lo/hi column
slabs so every GEMM is a row-slice @ chunk-slice with no relayout):

  rows [ 0,  2P)  Wf                     (D, P)
  rows [2P,  4P)  Ws                     (D, P)
  rows [4P,  5P)  Wc_local  block-diagonal combine, local half   (P, P)
  rows [5P,  6P)  Wc_summary                                     (P, P)
  rows [6P,  7P)  Wproj[:, :P]           (P, P)
  rows [7P,  8P)  Wproj[:, P:]           (P, P)
  rows [8P, 10P)  W1[:, :P]              (D, P)
  rows [10P,12P)  W1[:, P:]              (D, P)
  rows [12P,14P)  W2[:, :P]              (D, P)
  rows [14P,16P)  W2[:, P:]              (D, P)

plus an (8, 3*P) f32 "smalls" block (biases + LayerNorm affines, P-wide
column segments).  The per-head combine runs as TWO dense block-diagonal
(P, P) GEMMs — same values as the reference's per-head einsum (the zero
padding contributes exact +0 terms).  Per-head LayerNorm runs without any
(N, H, df) relayout: group stats via an indicator matmul ``v @ G``
(G[i, h] = [i // df == h]) broadcast back with ``G^T`` — MXU work instead
of a VMEM reshape.

Numerics: matmul operands in ``dtype`` (bf16 by default) with f32
accumulation, LayerNorm/GELU in f32 — the same policy as
``vis.apply(compute_dtype='bfloat16')`` (``ops/nn.py``), so outputs agree
to bf16 tolerance; with ``dtype=float32`` (tests, interpret mode) outputs
match the f32 parity path to ~1e-5.  GELU uses the A&S 7.1.26 erf
polynomial (|err| <= 1.5e-7 ~= f32 ulp; Mosaic has no erf lowering).

The token mean + head LayerNorm + (D, G) gene head stay in XLA: one big
GEMM that XLA already runs at the HBM roofline, and the panel-slicing
path (``vis.slice_head``) keeps working unchanged.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequoia_tpu.ops.nn import LN_EPS

CHUNK_ROWS = 16  # x P
SMALL_ROWS = 8   # x 3P f32

# smalls row, column-segment (k = segment index, P wide) assignments
_SM = {"bf": (0, 0), "ln_f_scale": (0, 1), "ln_f_bias": (0, 2),
       "bs": (1, 0), "ln_s_scale": (1, 1), "ln_s_bias": (1, 2),
       "bc": (2, 0),
       "bp_lo": (3, 0), "bp_hi": (3, 1),
       "b1_lo": (4, 0), "b1_hi": (4, 1),
       "b2_lo": (5, 0), "b2_hi": (5, 1),
       "ln_ff_scale_lo": (6, 0), "ln_ff_scale_hi": (6, 1),
       "ln_ff_bias_lo": (7, 0), "ln_ff_bias_hi": (7, 1)}


def supported(cfg) -> bool:
    """True when this config maps onto the kernel's packed layout."""
    p = cfg.nheads * cfg.dim_f
    return (cfg.nheads * cfg.dim_s == p and cfg.nheads * cfg.dim_c == p
            and cfg.input_dim == 2 * p and p % 128 == 0)


def pack_vis_blocks(cfg, params, dtype=jnp.bfloat16):
    """Block parameters -> (chunks (depth, 16P, P) ``dtype``,
    smalls (depth, 8, 3P) f32, pos_emb (N, D) ``dtype``) in the layout
    documented in the module docstring."""
    assert supported(cfg), "pack_vis_blocks: unsupported ViS shape"
    p = cfg.nheads * cfg.dim_f
    depth, h, df = cfg.depth, cfg.nheads, cfg.dim_f
    b = {k: np.asarray(v, np.float32) for k, v in params["blocks"].items()}

    chunks = np.zeros((depth, CHUNK_ROWS * p, p), np.float32)
    smalls = np.zeros((depth, SMALL_ROWS, 3 * p), np.float32)

    def put_small(i, name, vec):
        r, k = _SM[name]
        smalls[i, r, k * p:(k + 1) * p] = vec

    for i in range(depth):
        chunks[i, 0:2 * p] = b["wf"][i]
        chunks[i, 2 * p:4 * p] = b["ws"][i]
        for hh in range(h):                       # block-diagonal combine
            r, c0 = hh * df, hh * cfg.dim_c
            chunks[i, 4 * p + r:4 * p + r + df, c0:c0 + cfg.dim_c] = \
                b["wc"][i, hh, :df]
            chunks[i, 5 * p + r:5 * p + r + df, c0:c0 + cfg.dim_c] = \
                b["wc"][i, hh, df:]
        chunks[i, 6 * p:7 * p] = b["wproj"][i][:, :p]
        chunks[i, 7 * p:8 * p] = b["wproj"][i][:, p:]
        chunks[i, 8 * p:10 * p] = b["w1"][i][:, :p]
        chunks[i, 10 * p:12 * p] = b["w1"][i][:, p:]
        chunks[i, 12 * p:14 * p] = b["w2"][i][:, :p]
        chunks[i, 14 * p:16 * p] = b["w2"][i][:, p:]

        put_small(i, "bf", b["bf"][i])
        put_small(i, "ln_f_scale", b["ln_f_scale"][i].reshape(-1))
        put_small(i, "ln_f_bias", b["ln_f_bias"][i].reshape(-1))
        put_small(i, "bs", b["bs"][i])
        put_small(i, "ln_s_scale", b["ln_s_scale"][i].reshape(-1))
        put_small(i, "ln_s_bias", b["ln_s_bias"][i].reshape(-1))
        put_small(i, "bc", b["bc"][i].reshape(-1))
        put_small(i, "bp_lo", b["bproj"][i][:p])
        put_small(i, "bp_hi", b["bproj"][i][p:])
        put_small(i, "b1_lo", b["b1"][i][:p])
        put_small(i, "b1_hi", b["b1"][i][p:])
        put_small(i, "b2_lo", b["b2"][i][:p])
        put_small(i, "b2_hi", b["b2"][i][p:])
        put_small(i, "ln_ff_scale_lo", b["ln_ff_scale"][i][:p])
        put_small(i, "ln_ff_scale_hi", b["ln_ff_scale"][i][p:])
        put_small(i, "ln_ff_bias_lo", b["ln_ff_bias"][i][:p])
        put_small(i, "ln_ff_bias_hi", b["ln_ff_bias"][i][p:])

    pos = jnp.asarray(params["pos_emb"], dtype)
    return jnp.asarray(chunks, dtype), jnp.asarray(smalls), pos


def _group_ln(v32, g, gt, inv_n, scale, bias):
    """Per-head LayerNorm of (N, P) f32 via indicator-matmul group stats
    (G: (P, H) with G[i, h] = [i // width == h]); biased variance,
    torch eps."""
    mean = jax.lax.dot(v32, g, precision=jax.lax.Precision.HIGHEST) * inv_n
    var = (jax.lax.dot(v32 * v32, g,
                       precision=jax.lax.Precision.HIGHEST) * inv_n
           - mean * mean)
    mean_b = jax.lax.dot(mean, gt, precision=jax.lax.Precision.HIGHEST)
    rstd_b = jax.lax.dot(jax.lax.rsqrt(var + LN_EPS), gt,
                         precision=jax.lax.Precision.HIGHEST)
    return (v32 - mean_b) * rstd_b * scale + bias


def _gelu(x32):
    """Exact-erf GELU with erf evaluated by the Abramowitz & Stegun 7.1.26
    rational polynomial (|abs err| <= 1.5e-7 ~= f32 ulp) — Mosaic has no
    erf/erfc lowering, and XLA's own erf is a polynomial of the same
    accuracy class, so this stays within f32 noise of ``ops.nn.gelu``."""
    a = x32 * jnp.float32(0.7071067811865476)
    z = jnp.abs(a)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * z)
    poly = t * (jnp.float32(0.254829592)
                + t * (jnp.float32(-0.284496736)
                       + t * (jnp.float32(1.421413741)
                              + t * (jnp.float32(-1.453152027)
                                     + t * jnp.float32(1.061405429)))))
    erf = jnp.sign(a) * (1.0 - poly * jnp.exp(-z * z))
    return 0.5 * x32 * (1.0 + erf)


def _kernel(depth, h, p, cdtype, x_ref, pos_ref, chunks_ref, smalls_ref,
            out_ref, x_s):
    d = pl.program_id(0)

    @pl.when(d == 0)
    def _init():
        x_s[:] = (x_ref[:] + pos_ref[:]).astype(cdtype)

    # smalls rows consumed as (1, P) 2-D column segments (Mosaic CHECK-
    # crashes on 1-D row extraction and cannot concatenate offset rows)
    def row(name):
        r, k = _SM[name]
        return smalls_ref[0, r:r + 1, k * p:(k + 1) * p]

    def w(lo_row, n_rows):  # (n_rows*P, P) slab of this block's chunk
        return chunks_ref[0, lo_row * p:(lo_row + n_rows) * p, :]

    width = p // h
    g = (jax.lax.broadcasted_iota(jnp.int32, (p, h), 0) // width
         == jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)).astype(jnp.float32)
    gt = (jax.lax.broadcasted_iota(jnp.int32, (h, p), 1) // width
          == jax.lax.broadcasted_iota(jnp.int32, (h, p), 0)).astype(jnp.float32)
    inv_n = jnp.float32(1.0 / width)

    # f32-packed weights (tests / parity) must not round through bf16 on
    # the MXU; bf16 packs take the fast path with f32 accumulation
    mm_prec = (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
               else jax.lax.Precision.DEFAULT)

    def dot(a, b):
        return jax.lax.dot(a.astype(cdtype), b, precision=mm_prec,
                           preferred_element_type=jnp.float32)

    n_tok = x_s.shape[0]
    xb = x_s[:]

    # mixer: local + summary branches from the block input
    local = _gelu(_group_ln(dot(xb, w(0, 2)) + row("bf"), g, gt, inv_n,
                            row("ln_f_scale"), row("ln_f_bias")))
    sv = jnp.mean(dot(xb, w(2, 2)) + row("bs"), axis=0, keepdims=True)
    svb = jnp.broadcast_to(sv, (n_tok, p))   # (1, P) shapes trip Mosaic
    summ = _gelu(_group_ln(svb, g, gt, inv_n,
                           row("ln_s_scale"), row("ln_s_bias")))
    c = _gelu(dot(local, w(4, 1)) + dot(summ, w(5, 1)) + row("bc"))

    # projection + residual
    x32 = xb.astype(jnp.float32)
    x_lo = x32[:, :p] + dot(c, w(6, 1)) + row("bp_lo")
    x_hi = x32[:, p:] + dot(c, w(7, 1)) + row("bp_hi")

    # FeedForward: LN (affine per half), two GEMMs split over columns
    mean = (jnp.sum(x_lo, axis=-1, keepdims=True)
            + jnp.sum(x_hi, axis=-1, keepdims=True)) / (2 * p)
    var = (jnp.sum(jnp.square(x_lo - mean), axis=-1, keepdims=True)
           + jnp.sum(jnp.square(x_hi - mean), axis=-1,
                     keepdims=True)) / (2 * p)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    y_lo = (x_lo - mean) * rstd * row("ln_ff_scale_lo") + row("ln_ff_bias_lo")
    y_hi = (x_hi - mean) * rstd * row("ln_ff_scale_hi") + row("ln_ff_bias_hi")
    h_lo = _gelu(dot(y_lo, w(8, 1)) + dot(y_hi, w(9, 1)) + row("b1_lo"))
    h_hi = _gelu(dot(y_lo, w(10, 1)) + dot(y_hi, w(11, 1)) + row("b1_hi"))
    x_lo = x_lo + dot(h_lo, w(12, 1)) + dot(h_hi, w(13, 1)) + row("b2_lo")
    x_hi = x_hi + dot(h_lo, w(14, 1)) + dot(h_hi, w(15, 1)) + row("b2_hi")

    x_s[:, :p] = x_lo.astype(cdtype)
    x_s[:, p:] = x_hi.astype(cdtype)

    @pl.when(d == depth - 1)
    def _emit():
        out_ref[:, :p] = x_lo
        out_ref[:, p:] = x_hi


@functools.partial(jax.jit,
                   static_argnames=("depth", "nheads", "interpret"))
def vis_blocks_fused(x, pos_emb, chunks, smalls, *, depth: int, nheads: int,
                     interpret: bool = False) -> jax.Array:
    """(N, D) f32 tokens -> (N, D) f32 block-stack output (pos-emb add +
    all ``depth`` ViS blocks in one kernel).  Token mean + head stay with
    the caller."""
    n, d_model = x.shape
    p = d_model // 2
    cdtype = chunks.dtype
    kernel = functools.partial(_kernel, depth, nheads, p, cdtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, d_model), jnp.float32),
        grid=(depth,),
        in_specs=[
            pl.BlockSpec((n, d_model), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d_model), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_ROWS * p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SMALL_ROWS, 3 * p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, d_model), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, d_model), cdtype),    # resident activation
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * depth * n * d_model * p * 6,
            bytes_accessed=chunks.size * chunks.dtype.itemsize
            + smalls.size * 4 + 2 * x.size * 4,
            transcendentals=depth * n * 3 * p),
        interpret=interpret,
    )(x, pos_emb.astype(jnp.float32), chunks, smalls)


def vis_apply_fused(cfg, params, packed, x, *, interpret: bool = False):
    """Drop-in ``vis.apply`` for B=1 serving: ``(1, N, D) -> (1, G)``.

    ``packed`` from :func:`pack_vis_blocks`.  The blocks run in the fused
    kernel; token mean, head LayerNorm, and the (D, G) gene head run in
    XLA exactly as ``vis.apply`` does."""
    from sequoia_tpu.ops.nn import layer_norm, linear

    chunks, smalls, pos = packed
    assert x.ndim == 3 and x.shape[0] == 1, "fused path serves B=1"
    assert x.shape[1] == pos.shape[0] and x.shape[2] == cfg.input_dim
    tokens = vis_blocks_fused(x[0].astype(jnp.float32), pos, chunks, smalls,
                              depth=cfg.depth, nheads=cfg.nheads,
                              interpret=interpret)
    pooled = jnp.mean(tokens, axis=0, keepdims=True)
    pooled = layer_norm(pooled, params["head_ln_scale"],
                        params["head_ln_bias"])
    return linear(pooled, params["head_w"], params["head_b"])
