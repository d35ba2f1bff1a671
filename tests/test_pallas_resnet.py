"""Fused Pallas bottleneck chain vs the XLA conv path (interpret on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet
from sequoia_tpu.ops import pallas_resnet


def small_params(key, blocks_per_stage=(2, 2), widths=(8, 16), cin0=8):
    """A tiny bottleneck ResNet (expansion 4) for kernel validation."""
    def conv(key, kh, kw, ci, co):
        return jax.random.normal(key, (kh, kw, ci, co), jnp.float32) \
            * np.sqrt(2.0 / (kh * kw * ci))

    def bn(key, c):
        k1, k2 = jax.random.split(key)
        return {"scale": 1.0 + 0.1 * jax.random.normal(k1, (c,)),
                "bias": 0.1 * jax.random.normal(k2, (c,))}

    keys = iter(jax.random.split(key, 128))
    params = {}
    cin = cin0
    for s, n in enumerate(blocks_per_stage):
        w = widths[s]
        cout = 4 * w
        layer = []
        for b in range(n):
            blk = {"conv1": conv(next(keys), 1, 1, cin, w),
                   "bn1": bn(next(keys), w),
                   "conv2": conv(next(keys), 3, 3, w, w),
                   "bn2": bn(next(keys), w),
                   "conv3": conv(next(keys), 1, 1, w, cout),
                   "bn3": bn(next(keys), cout)}
            if b == 0:
                blk["downsample_conv"] = conv(next(keys), 1, 1, cin, cout)
                blk["downsample_bn"] = bn(next(keys), cout)
            layer.append(blk)
            cin = cout
        params[f"layer{s + 1}"] = layer
    return params


def xla_chain(blocks, start, x):
    for b in range(start, len(blocks)):
        x = resnet._bottleneck(x, blocks[b], 1)
    return x


@pytest.mark.parametrize("H,W", [(8, 8), (8, 16)])
def test_chain_matches_xla(H, W):
    params = small_params(jax.random.PRNGKey(0))
    blocks = params["layer1"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 8), jnp.float32)

    want = np.asarray(xla_chain(blocks, 0, x))

    flat, meta = pallas_resnet.stage_chain_weights(blocks, 0, x.dtype)
    got = pallas_resnet.bottleneck_chain(
        x.reshape(2, H * W, 8), flat, meta=meta, H=H, W=W, row_chunk=H * W,
        interpret=True)
    got = np.asarray(got).reshape(want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_chain_row_chunking_matches_unchunked():
    params = small_params(jax.random.PRNGKey(2))
    blocks = params["layer1"]
    H = W = 8
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H * W, 8), jnp.float32)
    flat, meta = pallas_resnet.stage_chain_weights(blocks, 0, x.dtype)

    full = pallas_resnet.bottleneck_chain(x, flat, meta=meta, H=H, W=W,
                                          row_chunk=H * W, interpret=True)
    chunked = pallas_resnet.bottleneck_chain(x, flat, meta=meta, H=H, W=W,
                                             row_chunk=2 * W, interpret=True)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("H,W", [(8, 8), (8, 16)])
def test_chain_cp_matches_xla(H, W):
    """(C, P)-layout chain (channels on sublanes) vs the XLA conv path."""
    params = small_params(jax.random.PRNGKey(0))
    blocks = params["layer1"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 8), jnp.float32)

    want = np.asarray(xla_chain(blocks, 0, x))

    flat, meta = pallas_resnet.stage_chain_weights_cp(blocks, 0, x.dtype)
    got = pallas_resnet.bottleneck_chain_cp(
        x.transpose(0, 3, 1, 2).reshape(2, 8, H * W), flat, meta=meta,
        H=H, W=W, interpret=True)
    got = np.asarray(got).reshape(2, want.shape[-1], H, W).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stem16_matches_s2d_conv():
    """16-tap-stack stem GEMM == stem_space_to_depth conv + BN + ReLU."""
    params = resnet.random_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, 3), jnp.float32)

    want = jax.nn.relu(resnet._bn(
        resnet.stem_space_to_depth(x, params["conv1_s2d"]), params["bn1"]))

    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xs = x.reshape(b, h2, 2, w2, 2, c).transpose(0, 2, 4, 5, 1, 3)
    x16 = jnp.pad(xs.reshape(b, 12, h2, w2), ((0, 0), (0, 4), (2, 1), (0, 0)))
    a, bias = pallas_resnet.fold_stem16_weights(params["conv1_s2d"],
                                                params["bn1"], x.dtype)
    got = pallas_resnet.stem16(x16.reshape(b, 16, (h2 + 3) * w2),
                               a, bias, H2=h2, W2=w2, interpret=True)
    got = np.asarray(got).reshape(b, 64, h2, w2).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_forward_extract_early_pallas_matches_xla():
    """Full resnet50 forward with early_pallas (Pallas stem + NCHW pool +
    (C,P) layer1) == plain XLA path."""
    params = resnet.random_params(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).integers(
        0, 256, size=(2, 32, 32, 3), dtype=np.uint8)

    want = np.asarray(resnet.extract_from_uint8(
        resnet.ResNetConfig(), params, imgs))
    got = np.asarray(resnet.extract_from_uint8(
        resnet.ResNetConfig(early_pallas=True), params, imgs))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)


@pytest.mark.slow
def test_forward_extract_fused_stages_matches_xla():
    """Full resnet50 forward with fused_stages=(1, 2) == plain XLA path
    (includes the stride-2 transitions and partial-stage fusion)."""
    params = resnet.random_params(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).integers(
        0, 256, size=(2, 64, 64, 3), dtype=np.uint8)

    base = resnet.ResNetConfig()
    fused = resnet.ResNetConfig(fused_stages=(1, 2))
    want = np.asarray(resnet.extract_from_uint8(base, params, imgs))
    got = np.asarray(resnet.extract_from_uint8(fused, params, imgs))
    # f32-accumulation order differs through 16 blocks; ReLU boundaries can
    # flip a few near-zero activations -> small absolute slack
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)
