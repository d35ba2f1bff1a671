"""Tissue masking math on device: HSV, Otsu, morphology, contrast checks.

Behavior contract (reference ``pre_processing/patch_gen_hdf5.py:25-38,
70-71, 110-115``): the tissue mask is

    S > otsu(S)  AND  NOT (R > otsu(R) AND G > otsu(G) AND B > otsu(B))
    AND R > 50 AND G > 50 AND B > 50

computed with skimage semantics (``rgb2hsv`` on [0,1] floats;
``threshold_otsu`` with 256 bins spanning the image's own min..max), then
``scipy.ndimage.binary_dilation``/``erosion`` with the default cross
structuring element, 3 iterations (``patch_gen_hdf5.py:70-71``).  Patch acceptance re-runs the mask on the
patch (>=20% tissue) and rejects low-contrast patches per skimage
``is_low_contrast`` (gray p99-p1 range < 5% of the dtype range).

All ops are jnp, batched over a leading axis where useful, so thousands of
candidate patches are screened per device launch instead of one at a time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_saturation(img: jax.Array) -> jax.Array:
    """(..., 3) uint8/float RGB -> HSV saturation channel (skimage formula:
    S = (max-min)/max, 0 where max == 0)."""
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    delta = mx - mn
    return jnp.where(mx > 0, delta / jnp.where(mx > 0, mx, 1.0), 0.0)


def _binned_histogram(idx: jax.Array, nbins: int, chunk: int = 4096) -> jax.Array:
    """(..., P) int32 bin indices -> (..., nbins) f32 counts.

    Accumulates one-hot counts over pixel chunks with ``lax.scan`` so peak
    memory is O(chunk * nbins) instead of O(P * nbins) — a 256x256 patch
    would otherwise materialize a 67 MB one-hot per channel.
    """
    p = idx.shape[-1]
    pad = (-p) % chunk
    if pad:
        # overflow bin nbins collects the padding and is dropped below
        idx = jnp.concatenate(
            [idx, jnp.full(idx.shape[:-1] + (pad,), nbins, idx.dtype)], axis=-1)
    n = idx.shape[-1] // chunk
    chunks = jnp.moveaxis(idx.reshape(idx.shape[:-1] + (n, chunk)), -2, 0)

    def step(acc, ch):
        oh = jax.nn.one_hot(ch, nbins + 1, dtype=jnp.float32)
        return acc + jnp.sum(oh, axis=-2), None

    acc0 = jnp.zeros(chunks.shape[1:-1] + (nbins + 1,), jnp.float32)
    hist, _ = jax.lax.scan(step, acc0, chunks)
    return hist[..., :nbins]


def _otsu_best_center(hist: jax.Array, centers: jax.Array) -> jax.Array:
    """Inter-class-variance argmax -> bin-center threshold (skimage
    ``threshold_otsu`` core; index alignment verified against its
    ``weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:])**2``)."""
    w1 = jnp.cumsum(hist, axis=-1)
    w2 = w1[..., -1:] - w1
    cm = jnp.cumsum(hist * centers, axis=-1)
    total = cm[..., -1:]
    mean1 = cm / jnp.maximum(w1, 1e-30)
    mean2 = (total - cm) / jnp.maximum(w2, 1e-30)
    var12 = (w1 * w2 * (mean1 - mean2) ** 2)[..., :-1]
    best = jnp.argmax(var12, axis=-1)
    return jnp.take_along_axis(jnp.broadcast_to(centers, hist.shape),
                               best[..., None], axis=-1)[..., 0]


def otsu_threshold(values: jax.Array, nbins: int = 256) -> jax.Array:
    """skimage ``threshold_otsu``.

    Float input: ``nbins`` even bins over [min, max], fractional
    bin-center threshold.  uint8 input: skimage IGNORES nbins for integer
    images and uses one bincount bin per integer value — the threshold is
    an integer (the reference thresholds raw R/G/B channels this way; the
    float path only sees the HSV saturation channel).

    ``values``: (..., P) — batched over leading axes, thresholds per sample.
    """
    if values.dtype == jnp.uint8:
        idx = values.astype(jnp.int32)
        hist = _binned_histogram(idx, 256)
        # full 0..255 range: bins outside [min, max] have zero counts, so
        # their inter-class variance is 0 and the argmax matches skimage's
        # min..max-restricted bincount exactly
        centers = jnp.arange(256, dtype=jnp.float32)
        thr = _otsu_best_center(hist, centers)
        vmin = jnp.min(idx, axis=-1).astype(jnp.float32)
        vmax = jnp.max(idx, axis=-1).astype(jnp.float32)
        # degenerate (constant) input: skimage raises; return the value
        return jnp.where(vmax > vmin, thr, vmin)

    v = values.astype(jnp.float32)
    vmin = jnp.min(v, axis=-1, keepdims=True)
    vmax = jnp.max(v, axis=-1, keepdims=True)
    width = (vmax - vmin) / nbins
    safe_w = jnp.where(width > 0, width, 1.0)
    idx = jnp.clip(((v - vmin) / safe_w).astype(jnp.int32), 0, nbins - 1)
    hist = _binned_histogram(idx, nbins)  # (..., nbins)
    centers = vmin + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * safe_w
    thr = _otsu_best_center(hist, centers)
    # degenerate (constant) input: skimage raises; we return the value itself
    return jnp.where(width[..., 0] > 0, thr, vmin[..., 0])


def tissue_mask(img: jax.Array, rgb_min: int = 50) -> jax.Array:
    """Reference ``get_mask_image`` on one (H, W, 3) uint8/float image."""
    x = img.astype(jnp.float32)
    h, w, _ = x.shape
    # keep the ORIGINAL dtype for the channel thresholds: skimage's Otsu
    # uses per-integer-value bins for uint8 images (the reference
    # thresholds raw channels), not the 256-even-bin float path
    flat = img.reshape(h * w, 3)
    r_thr = otsu_threshold(flat[:, 0])
    g_thr = otsu_threshold(flat[:, 1])
    b_thr = otsu_threshold(flat[:, 2])
    background = ((x[..., 0] > r_thr) & (x[..., 1] > g_thr) & (x[..., 2] > b_thr))
    sat = rgb_to_saturation(img)
    s_thr = otsu_threshold(sat.reshape(h * w))
    tissue_s = sat > s_thr
    min_rgb = (x[..., 0] > rgb_min) & (x[..., 1] > rgb_min) & (x[..., 2] > rgb_min)
    return tissue_s & ~background & min_rgb


def tissue_mask_batch(imgs: jax.Array, rgb_min: int = 50) -> jax.Array:
    """(B, H, W, 3) -> (B, H, W) bool, one fused launch for a patch batch."""
    return jax.vmap(lambda im: tissue_mask(im, rgb_min))(imgs)


def _cross_dilate(m: jax.Array) -> jax.Array:
    p = jnp.pad(m, 1)
    return (p[1:-1, 1:-1] | p[:-2, 1:-1] | p[2:, 1:-1]
            | p[1:-1, :-2] | p[1:-1, 2:])


def _cross_erode(m: jax.Array) -> jax.Array:
    p = jnp.pad(m, 1)  # zero padding matches scipy border_value=0
    return (p[1:-1, 1:-1] & p[:-2, 1:-1] & p[2:, 1:-1]
            & p[1:-1, :-2] & p[1:-1, 2:])


@partial(jax.jit, static_argnames=("iterations",))
def binary_dilation(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """scipy.ndimage.binary_dilation default (cross) structuring element."""
    m = mask.astype(bool)
    for _ in range(iterations):
        m = _cross_dilate(m)
    return m


@partial(jax.jit, static_argnames=("iterations",))
def binary_erosion(mask: jax.Array, iterations: int = 1) -> jax.Array:
    m = mask.astype(bool)
    for _ in range(iterations):
        m = _cross_erode(m)
    return m


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """skimage rgb2gray weights on [0,1] floats."""
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    w = jnp.asarray([0.2125, 0.7154, 0.0721], jnp.float32)
    return x @ w


def is_low_contrast(img: jax.Array, fraction_threshold: float = 0.05,
                    lower_percentile: float = 1,
                    upper_percentile: float = 99) -> jax.Array:
    """skimage ``is_low_contrast`` for (H, W, 3) uint8: gray percentile range
    vs float dtype range [-1, 1] (width 2)."""
    gray = rgb_to_gray(img)
    lo, hi = jnp.percentile(gray, jnp.asarray([lower_percentile,
                                               upper_percentile]))
    return (hi - lo) / 2.0 < fraction_threshold


@jax.jit
def patch_keep_flags(patches_u8: jax.Array,
                     background_threshold: float = 0.2) -> jax.Array:
    """Batched patch screening (reference per-patch loop, one launch):
    keep = dilated tissue mask covers > threshold AND not low contrast."""
    def one(p):
        m = tissue_mask(p)
        m = binary_dilation(m, iterations=3)
        frac_ok = jnp.sum(m) > background_threshold * m.size
        return frac_ok & ~is_low_contrast(p)

    return jax.vmap(one)(patches_u8)
