"""Bit-exact Pillow resize as MXU GEMMs.

The reference's UNI path resizes each 256px patch with
``torchvision.transforms.Resize(224)`` applied to a PIL image
(reference ``pre_processing/compute_features_hdf5.py:53-56`` — ``Resize``
before ``ToTensor``), i.e. Pillow's BILINEAR resample with its implicit
antialiasing (Pillow scales the filter support by the downscale factor).

Pillow's 8-bit resample (ImageResample.c) is bit-defined: per-axis
coefficients are quantized to integers at ``PRECISION_BITS = 22``, each
pass accumulates ``sum(pixel * k)`` in int32, adds ``2**21``,
arithmetic-shifts by 22 (= floor) and clips to uint8, and the horizontal
pass runs first with a uint8 intermediate image.  ``jax.image.resize``
differs in filter shape and rounding — and its antialiased lowering both
compiles pathologically slowly and runs ~25 ms/batch-128 on TPU.

Plain f32 GEMMs cannot reproduce this bit-for-bit: the exact integer sums
cluster within a few fixed-point units of the floor boundaries (bilinear
weights at small rational scales are near-halves), far below f32
accumulation error.  So each pass runs EXACT integer arithmetic on the
MXU: the int coefficients split into three signed bytes
(``k = a*2**16 + b*2**8 + c``), each byte GEMMed against the uint8 pixels
in bf16 (both operands integers < 2**8, accumulated exactly in f32 —
partial sums < 2**24), then recombined, rounded, shifted, and clipped in
int32 exactly as Pillow does.  tests/test_pil_resize.py asserts equality
with Pillow itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION_BITS = 22  # Pillow: 32 - 8 - 2


def _filter(name: str):
    if name == "bilinear":
        def f(x):
            x = abs(x)
            return 1.0 - x if x < 1.0 else 0.0
        return f, 1.0
    if name == "bicubic":  # Pillow a = -0.5
        def f(x):
            x = abs(x)
            if x < 1.0:
                return ((1.5 * x - 2.5) * x) * x + 1.0
            if x < 2.0:
                return (((-0.5 * x + 2.5) * x) - 4.0) * x + 2.0
            return 0.0
        return f, 2.0
    raise ValueError(f"unknown filter {name!r}")


@functools.lru_cache(maxsize=64)
def pil_coeff_matrix(in_size: int, out_size: int,
                     filt: str = "bilinear") -> np.ndarray:
    """Pillow ``precompute_coeffs`` + ``normalize_coeffs_8bpc`` as a dense
    (out_size, in_size) int32 matrix of the quantized coefficients
    (each row sums to ~2**22)."""
    f, support0 = _filter(filt)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ss = 1.0 / filterscale

    m = np.zeros((out_size, in_size), np.int64)
    one = 1 << _PRECISION_BITS
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        w = np.array([f((x - center + 0.5) * ss) for x in range(xmin, xmax)])
        w /= w.sum()
        # Pillow quantizes half-away-from-zero (C truncation of +-0.5 + v)
        m[xx, xmin:xmax] = np.where(
            w < 0, np.ceil(w * one - 0.5), np.floor(w * one + 0.5))
    return m.astype(np.int32)


@functools.lru_cache(maxsize=64)
def _byte_split(in_size: int, out_size: int, filt: str) -> tuple:
    """Signed-byte split of the int coefficient matrix: three (in, out)
    bf16 matrices (a, b, c) with k = a*2**16 + b*2**8 + c, |a| <= 2**6,
    0 <= b, c < 2**8 — every entry exact in bf16."""
    k = pil_coeff_matrix(in_size, out_size, filt).astype(np.int64).T
    a = k >> 16                       # arithmetic: carries the sign
    r = k - (a << 16)                 # in [0, 2**16)
    b, c = r >> 8, r & 0xFF
    # numpy (ml_dtypes bf16), NOT device arrays: the cache outlives any one
    # jit trace, and a device constant created inside a trace would leak
    to = lambda x: x.astype(np.float32).astype(jnp.bfloat16)
    return to(a), to(b), to(c)


def _pass(x_u8: jax.Array, mats: tuple, axis: int) -> jax.Array:
    """One resample pass, bit-exact Pillow: three exact byte GEMMs on the
    contracted ``axis``, int32 recombination, round+shift+clip to uint8."""
    xb = x_u8.astype(jnp.bfloat16)
    parts = []
    for m in mats:
        y = jnp.tensordot(xb, m, axes=[[axis], [0]],
                          preferred_element_type=jnp.float32)
        parts.append(jnp.moveaxis(y, -1, axis).astype(jnp.int32))
    sa, sb, sc = parts
    s = (sa << 16) + (sb << 8) + sc + (1 << (_PRECISION_BITS - 1))
    y = jnp.clip(s >> _PRECISION_BITS, 0, 255)
    return y.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "filt"))
def resize_u8(images_u8: jax.Array, out_h: int, out_w: int,
              filt: str = "bilinear") -> jax.Array:
    """(..., H, W, C) uint8 -> (..., out_h, out_w, C) uint8, bit-exact
    Pillow semantics (horizontal pass first, uint8 intermediate)."""
    h_axis, w_axis = images_u8.ndim - 3, images_u8.ndim - 2
    x = images_u8
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if in_w != out_w:
        x = _pass(x, _byte_split(in_w, out_w, filt), w_axis)
    if in_h != out_h:
        x = _pass(x, _byte_split(in_h, out_h, filt), h_axis)
    return x
