"""PIL-exact resize (ops/pil_resize.py) vs Pillow itself.

The contract under test: reference ``compute_features_hdf5.py:53-56``
resizes UNI patches with ``transforms.Resize(224)`` on a PIL image =
Pillow BILINEAR with implicit antialiasing and fixed-point rounding.
"""

import numpy as np
import pytest
from PIL import Image

import jax

from sequoia_tpu.ops import pil_resize


def _pil_resize(u8: np.ndarray, out_hw, filt) -> np.ndarray:
    resample = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}[filt]
    out = [np.asarray(Image.fromarray(img).resize(
        (out_hw[1], out_hw[0]), resample=resample)) for img in u8]
    return np.stack(out)


@pytest.mark.parametrize("in_hw,out_hw,filt", [
    ((256, 256), (224, 224), "bilinear"),  # the UNI patch contract
    ((300, 280), (224, 224), "bilinear"),  # non-square downscale
    ((100, 100), (224, 224), "bilinear"),  # upscale
    ((256, 256), (224, 224), "bicubic"),
])
def test_matches_pillow(in_hw, out_hw, filt):
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(4, *in_hw, 3), dtype=np.uint8)

    want = _pil_resize(u8, out_hw, filt)
    got = np.asarray(pil_resize.resize_u8(jax.numpy.asarray(u8),
                                          out_hw[0], out_hw[1], filt))

    np.testing.assert_array_equal(got, want)


def test_identity_when_same_size():
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    got = np.asarray(pil_resize.resize_u8(jax.numpy.asarray(u8), 64, 64))
    np.testing.assert_array_equal(got, u8)


def test_coeff_rows_normalized():
    m = pil_resize.pil_coeff_matrix(256, 224)
    # quantized rows sum to ~2**22 (within per-tap rounding)
    np.testing.assert_allclose(m.sum(axis=1), 1 << 22, atol=4)
    # bilinear-antialias support at scale 8/7: at most 4 taps per row
    assert (m != 0).sum(axis=1).max() <= 4


def test_uni_feature_extractor_resizes_like_pillow():
    """The UNI FeatureExtractor's fused path resizes 256->224 bit-exactly
    like the reference's transforms.Resize(224) (PIL bilinear) before
    normalization — verified by comparing features against a manual
    PIL-resized forward (tiny ViT config)."""
    import jax.numpy as jnp

    from sequoia_tpu.models import resnet as resnet_mod
    from sequoia_tpu.models import uni_vit
    from sequoia_tpu.pipeline.features import FeatureExtractor

    cfg = uni_vit.UniViTConfig(img_size=224, patch_size=56, dim=32, depth=2,
                               heads=4, mlp_dim=64)
    params = uni_vit.random_params(cfg, jax.random.PRNGKey(0))
    ex = FeatureExtractor("uni", params, batch_size=3, cfg=cfg)

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(3, 256, 256, 3), dtype=np.uint8)
    got = ex(u8)

    pil = _pil_resize(u8, (224, 224), "bilinear")
    x = pil.astype(np.float32) / 255.0
    x = (x - np.asarray(resnet_mod.IMAGENET_MEAN)) / np.asarray(
        resnet_mod.IMAGENET_STD)
    want = np.asarray(uni_vit.forward(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_uni_scan_chunking_matches_direct_forward():
    """The in-jit scan over UNI_SCAN_CHUNK sub-batches (a TPU throughput
    win: the (bs, 197, 4096) MLP activation tiles better small) must not
    change the features vs one direct full-batch forward."""
    from sequoia_tpu.models import uni_vit
    from sequoia_tpu.pipeline.features import FeatureExtractor

    cfg = uni_vit.UniViTConfig(img_size=224, patch_size=56, dim=32, depth=2,
                               heads=4, mlp_dim=64)
    params = uni_vit.random_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(8, 256, 256, 3), dtype=np.uint8)

    chunked = FeatureExtractor("uni", params, batch_size=8, cfg=cfg)
    assert chunked.UNI_SCAN_CHUNK  # chunking is the default
    chunked.UNI_SCAN_CHUNK = 4     # 8 % 4 == 0 -> scan path
    direct = FeatureExtractor("uni", params, batch_size=8, cfg=cfg)
    direct.UNI_SCAN_CHUNK = 0      # disables chunking

    np.testing.assert_allclose(chunked(u8), direct(u8), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_matches_pillow_scale_sweep():
    """Bit-exactness across a sweep of scales/filters (downs, ups,
    non-integer ratios, rectangles) — the coefficient generator and the
    integer pass must hold everywhere, not just at 256->224."""
    rng = np.random.default_rng(7)
    cases = [
        ((512, 512), (224, 224)), ((256, 256), (256, 256)),
        ((224, 224), (256, 256)), ((333, 217), (224, 224)),
        ((64, 128), (96, 40)), ((1024, 768), (224, 224)),
    ]
    for filt in ("bilinear", "bicubic"):
        for in_hw, out_hw in cases:
            u8 = rng.integers(0, 256, size=(2, *in_hw, 3), dtype=np.uint8)
            want = _pil_resize(u8, out_hw, filt)
            got = np.asarray(pil_resize.resize_u8(
                jax.numpy.asarray(u8), out_hw[0], out_hw[1], filt))
            np.testing.assert_array_equal(
                got, want, err_msg=f"{filt} {in_hw}->{out_hw}")
