"""Backbone parity: ResNet-50 and UNI ViT-L/16 vs torch-functional goldens."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet, uni_vit
from tests import torch_goldens as tg


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)


def test_resnet50_forward_extract_parity():
    rng = torch.Generator().manual_seed(0)
    sd = tg.resnet50_sd(rng)
    x = torch.randn(2, 3, 64, 64, generator=rng).double()
    golden = tg.resnet50_forward_extract(sd, x).numpy()

    params = resnet.resnet50_from_torch(sd)
    cfg = resnet.ResNetConfig()
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1), jnp.float32)
    out = jax.jit(lambda p, im: resnet.forward_extract(cfg, p, im))(params, x_nhwc)
    assert out.shape == (2, 2048)
    assert rel_err(out, golden) < 2e-4


@pytest.mark.slow
def test_resnet50_odd_input_size():
    """256-px patches (the pipeline size) flow through without resizing."""
    params = resnet.random_params(jax.random.PRNGKey(0))
    cfg = resnet.ResNetConfig()
    imgs = jnp.zeros((1, 256, 256, 3), jnp.float32)
    out = resnet.forward_extract(cfg, params, imgs)
    assert out.shape == (1, 2048)


def test_resnet_uint8_preprocess():
    u8 = jnp.asarray(np.full((1, 4, 4, 3), 255, np.uint8))
    x = resnet.preprocess_uint8(u8)
    want = (1.0 - np.asarray(resnet.IMAGENET_MEAN)) / np.asarray(resnet.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(x[0, 0, 0]), want, rtol=1e-5)


def test_uni_vit_parity():
    rng = torch.Generator().manual_seed(1)
    img, patch, dim, depth, heads, mlp = 32, 8, 64, 2, 4, 128
    sd = tg.uni_sd(rng, img, patch, dim, depth, heads, mlp)
    x = torch.randn(2, 3, img, img, generator=rng).double()
    golden = tg.uni_forward(sd, x, depth=depth, heads=heads).numpy()

    cfg = uni_vit.UniViTConfig(img_size=img, patch_size=patch, dim=dim,
                               depth=depth, heads=heads, mlp_dim=mlp)
    cfg2, params = uni_vit.uni_from_torch(sd, cfg)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1), jnp.float32)
    out = jax.jit(lambda p, im: uni_vit.forward(cfg, p, im))(params, x_nhwc)
    assert out.shape == (2, dim)
    assert rel_err(out, golden) < 2e-4


def test_uni_config_inference_from_sd():
    rng = torch.Generator().manual_seed(2)
    sd = tg.uni_sd(rng, img=32, patch=8, dim=64, depth=3, heads=4, mlp=96)
    cfg, params = uni_vit.uni_from_torch(sd, heads=4)
    assert cfg.depth == 3 and cfg.mlp_dim == 96 and cfg.img_size == 32
    assert cfg.heads == 4
    assert params["blocks"]["w_qkv"].shape == (3, 64, 192)
    # head count is NOT recoverable from a fused-qkv dict: non-ViT-L
    # widths must not silently default to 16 heads
    with pytest.raises(ValueError, match="head count"):
        uni_vit.uni_from_torch(sd)


def test_s2d_stem_exactness():
    """space-to-depth stem == stride-2 7x7 conv, bit-for-bit math."""
    import jax.numpy as jnp_
    from jax import lax

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32) * 0.1)

    ref = lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    got = resnet.stem_space_to_depth(x, resnet.fold_stem_to_s2d(w))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_extract_s2d_matches_plain():
    params = resnet.random_params(jax.random.PRNGKey(3))
    assert "conv1_s2d" in params
    plain = {k: v for k, v in params.items() if k != "conv1_s2d"}
    cfg = resnet.ResNetConfig()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)),
                    jnp.float32)
    a = resnet.forward_extract(cfg, params, x)
    b = resnet.forward_extract(cfg, plain, x)
    # different stem reduction order accumulates ~1e-4 through 50 layers
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)


def test_resnet18_basic_block_parity():
    """resnet18 (BasicBlock) loads from a torchvision-style sd and matches
    the torch eval math."""
    import torch.nn.functional as F

    rng = torch.Generator().manual_seed(8)
    sd = {}

    def convw(name, cout, cin, k):
        sd[name + ".weight"] = (torch.randn(cout, cin, k, k, generator=rng)
                                * (cin * k * k) ** -0.5).double()

    def bn(name, c):
        sd[name + ".weight"] = (1 + 0.1 * torch.randn(c, generator=rng)).double()
        sd[name + ".bias"] = (0.1 * torch.randn(c, generator=rng)).double()
        sd[name + ".running_mean"] = (0.1 * torch.randn(c, generator=rng)).double()
        sd[name + ".running_var"] = (1 + 0.1 * torch.rand(c, generator=rng)).double()

    convw("conv1", 64, 3, 7); bn("bn1", 64)
    cin = 64
    for s, nblocks in enumerate((2, 2, 2, 2)):
        cout = 64 * 2 ** s
        for b in range(nblocks):
            pre = f"layer{s + 1}.{b}."
            convw(pre + "conv1", cout, cin, 3); bn(pre + "bn1", cout)
            convw(pre + "conv2", cout, cout, 3); bn(pre + "bn2", cout)
            if b == 0 and (s > 0):
                convw(pre + "downsample.0", cout, cin, 1)
                bn(pre + "downsample.1", cout)
            cin = cout

    def bn_eval(x, name):
        return torch.nn.functional.batch_norm(
            x, sd[name + ".running_mean"], sd[name + ".running_var"],
            sd[name + ".weight"], sd[name + ".bias"], training=False, eps=1e-5)

    x = torch.randn(1, 3, 64, 64, generator=rng).double()
    y = F.relu(bn_eval(F.conv2d(x, sd["conv1.weight"], stride=2, padding=3), "bn1"))
    y = F.max_pool2d(y, 3, 2, 1)
    for s, nblocks in enumerate((2, 2, 2, 2)):
        for b in range(nblocks):
            pre = f"layer{s + 1}.{b}."
            stride = 2 if (b == 0 and s > 0) else 1
            z = F.relu(bn_eval(F.conv2d(y, sd[pre + "conv1.weight"],
                                        stride=stride, padding=1), pre + "bn1"))
            z = bn_eval(F.conv2d(z, sd[pre + "conv2.weight"], padding=1), pre + "bn2")
            if pre + "downsample.0.weight" in sd:
                y = bn_eval(F.conv2d(y, sd[pre + "downsample.0.weight"],
                                     stride=stride), pre + "downsample.1")
            y = F.relu(z + y)
    golden = F.adaptive_avg_pool2d(y, (1, 1)).flatten(1).numpy()

    cfg, params = resnet.resnet_from_torch(sd)
    assert cfg.block == "basic" and cfg.blocks_per_stage == (2, 2, 2, 2)
    assert cfg.feature_dim == 512
    out = resnet.forward_extract(cfg, params,
                                 jnp.asarray(x.numpy().transpose(0, 2, 3, 1),
                                             jnp.float32))
    assert out.shape == (1, 512)
    assert rel_err(out, golden) < 2e-3


def test_resnet_feature_dim_for_matches_forward_extract():
    """AvgPool2d(7) flattening: >=448px inputs yield C*nh*nw features
    (reference ``x.view(B, -1)``), and FeatureExtractor's preallocation
    relies on ``feature_dim_for`` agreeing with the real output."""
    cfg = resnet.ResNetConfig()
    params = resnet.random_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for size, want in ((64, 2048), (224, 2048), (256, 2048), (448, 8192)):
        assert cfg.feature_dim_for(size, size) == want, size
        x = jnp.asarray(rng.normal(size=(1, size, size, 3)).astype(np.float32))
        out = resnet.forward_extract(cfg, params, x)
        assert out.shape == (1, want), (size, out.shape)


def test_feature_extractor_dim_tracks_patch_size():
    from sequoia_tpu.pipeline.features import FeatureExtractor

    params = resnet.random_params(jax.random.PRNGKey(0))
    assert FeatureExtractor("resnet", params,
                            patch_size=256).feature_dim == 2048
    assert FeatureExtractor("resnet", params,
                            patch_size=448).feature_dim == 8192


def test_uni_bf16_forward_with_torch_loaded_params():
    """Real-weights bf16 serving config: uni_from_torch yields STRONG-typed
    f32 LayerScale gammas; an uncast multiply would promote the bf16 scan
    carry to f32 and crash the forward (masked by random_params' weak
    types)."""
    rng = torch.Generator().manual_seed(2)
    img, patch, dim, depth, heads, mlp = 32, 8, 64, 2, 4, 128
    sd = tg.uni_sd(rng, img, patch, dim, depth, heads, mlp)
    cfg = uni_vit.UniViTConfig(img_size=img, patch_size=patch, dim=dim,
                               depth=depth, heads=heads, mlp_dim=mlp,
                               compute_dtype=jnp.bfloat16)
    _, params = uni_vit.uni_from_torch(sd, cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, img, img, 3)),
                    jnp.float32)
    out = jax.jit(lambda p, im: uni_vit.forward(cfg, p, im))(params, x)
    assert out.shape == (2, dim) and np.isfinite(np.asarray(out)).all()


def test_resnet_channel_variants_random_s2d_stem():
    """random_params_channels must rebuild the folded s2d stem for the new
    channel count (the stale 3-channel kernel crashed RNfour/RNone random
    inits on any even-sized input)."""
    for chans, maker in ((4, resnet.resnet50_4channel),
                         (1, resnet.resnet50_1channel)):
        params = maker(key=jax.random.PRNGKey(0))
        cfg = resnet.ResNetConfig(pool_stride=1)
        x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, chans)),
                        jnp.float32)
        out = resnet.forward_extract(cfg, params, x)
        assert np.isfinite(np.asarray(out)).all()
