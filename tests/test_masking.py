"""Masking-op parity vs scipy and reference-semantics numpy implementations."""

import colorsys

import numpy as np
from scipy import ndimage

import jax.numpy as jnp

from sequoia_tpu.ops import masking


def np_otsu(values, nbins=256):
    """skimage threshold_otsu reference implementation: integer images get
    one bincount bin per value (nbins ignored — skimage
    ``_bincount_histogram``); float images get ``nbins`` even bins."""
    v = np.asarray(values)
    if v.dtype.kind in "iu":
        vmin, vmax = int(v.min()), int(v.max())
        hist = np.bincount((v.ravel() - vmin).astype(np.int64),
                           minlength=vmax - vmin + 1).astype(float)
        centers = np.arange(vmin, vmax + 1, dtype=float)
    else:
        v = v.astype(np.float64)
        hist, edges = np.histogram(v, bins=nbins, range=(v.min(), v.max()))
        centers = (edges[:-1] + edges[1:]) / 2
        hist = hist.astype(float)
    w1 = np.cumsum(hist)
    w2 = np.cumsum(hist[::-1])[::-1]
    m1 = np.cumsum(hist * centers) / np.maximum(w1, 1e-30)
    m2 = (np.cumsum((hist * centers)[::-1]) / np.maximum(w2[::-1], 1e-30))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return centers[np.argmax(var12)]


def test_otsu_matches_reference():
    rng = np.random.default_rng(0)
    # bimodal
    v = np.r_[rng.normal(50, 5, 600), rng.normal(180, 12, 400)].astype(np.float32)
    got = float(masking.otsu_threshold(jnp.asarray(v)))
    want = np_otsu(v)
    # our inter-class variance indexing treats bins slightly differently at
    # the split bin; allow one bin width of slack
    binw = (v.max() - v.min()) / 256
    assert abs(got - want) <= binw * 1.5
    # and the two thresholds partition identically
    assert np.array_equal(v > got, v > want)


def test_otsu_batched():
    rng = np.random.default_rng(1)
    batch = np.stack([
        np.r_[rng.normal(30, 3, 100), rng.normal(200, 10, 100)],
        np.r_[rng.normal(90, 6, 100), rng.normal(140, 4, 100)],
    ]).astype(np.float32)
    thr = np.asarray(masking.otsu_threshold(jnp.asarray(batch)))
    for i in range(2):
        assert np.array_equal(batch[i] > thr[i],
                              batch[i] > np_otsu(batch[i]))


def test_saturation_matches_colorsys():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    got = np.asarray(masking.rgb_to_saturation(jnp.asarray(img)))
    for i in range(5):
        for j in range(4):
            r, g, b = img[i, j] / 255.0
            _, _, s_unused = colorsys.rgb_to_hls(r, g, b)
            s = colorsys.rgb_to_hsv(r, g, b)[1]
            assert abs(got[i, j] - s) < 1e-6


def test_morphology_matches_scipy():
    rng = np.random.default_rng(3)
    m = rng.random((40, 33)) > 0.7
    for it in (1, 3):
        d = np.asarray(masking.binary_dilation(jnp.asarray(m), iterations=it))
        e = np.asarray(masking.binary_erosion(jnp.asarray(m), iterations=it))
        np.testing.assert_array_equal(d, ndimage.binary_dilation(m, iterations=it))
        np.testing.assert_array_equal(e, ndimage.binary_erosion(m, iterations=it))


def test_tissue_mask_flags_tissue_not_background():
    img = np.full((32, 32, 3), 245, np.uint8)  # white background
    img[8:24, 8:24] = (150, 60, 120)  # pink-ish "tissue"
    m = np.asarray(masking.tissue_mask(jnp.asarray(img)))
    assert m[10:22, 10:22].all()
    assert not m[:4].any() and not m[:, :4].any()


def test_low_contrast():
    flat = np.full((16, 16, 3), 128, np.uint8)
    assert bool(masking.is_low_contrast(jnp.asarray(flat)))
    rng = np.random.default_rng(4)
    noisy = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert not bool(masking.is_low_contrast(jnp.asarray(noisy)))


def test_patch_keep_flags_batch():
    tissue = np.zeros((2, 32, 32, 3), np.uint8)
    tissue[0] = 245  # blank background patch -> drop
    rng = np.random.default_rng(5)
    tissue[1] = rng.integers(40, 230, size=(32, 32, 3))  # textured -> varies
    flags = np.asarray(masking.patch_keep_flags(jnp.asarray(tissue)))
    assert flags.shape == (2,)
    assert not flags[0]


def test_otsu_uint8_matches_skimage_integer_bins():
    """uint8 inputs take skimage's integer path (one bincount bin per
    value, nbins ignored) — the float 256-even-bin path can land on a
    different threshold for the same pixels."""
    rng = np.random.default_rng(4)
    for _ in range(5):
        v = np.concatenate([
            rng.integers(10, 90, 700), rng.integers(140, 250, 500),
        ]).astype(np.uint8)
        got = float(masking.otsu_threshold(jnp.asarray(v)))
        want = float(np_otsu(v))
        assert got == want, (got, want)
        assert float(got).is_integer()  # integer-valued bin center
