"""ResNet-50 feature extractor in JAX (NHWC, inference-tuned).

Behavior contract: reference ``src/resnet.py`` vendors the torchvision
ResNet; the pipeline uses ``resnet50(pretrained=True).forward_extract`` — a
2048-d embedding of a normalized 256x256 patch via ``nn.AvgPool2d(7)``
(FIXED 7x7/stride-7 windows: on the 8x8 layer4 map from a 256px patch the
reference pools only the top-left 7x7 — see forward_extract below)
(reference ``pre_processing/compute_features_hdf5.py`` resnet path; no
resize, only ConvertImageDtype + ImageNet Normalize).

TPU-first design:
* NHWC layout end-to-end (TPU-native conv layout).
* Eval-mode BatchNorm is pre-reduced at load time to per-channel
  ``scale = gamma / sqrt(running_var + eps)`` and
  ``bias = beta - running_mean * scale`` — mathematically identical to
  torch's eval BN, one fused multiply-add after each conv.
* uint8 -> float conversion + ImageNet normalization are folded into the
  jitted extraction function so patches travel to HBM as uint8 (4x less
  PCIe/ICI traffic than f32).
* ``compute_dtype=bfloat16`` runs convs on the MXU at full rate with f32
  accumulation; f32 mode pins HIGHEST precision for exactness.

Weights load from a torchvision-format state dict
(``conv1/bn1/layer{1..4}.{i}.conv{1..3}|bn{1..3}|downsample``) via
``resnet50_from_torch`` — the same tensors the reference pulls from the
torchvision model zoo.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

BLOCKS_PER_STAGE = (3, 4, 6, 3)  # resnet50
STAGE_WIDTH = (64, 128, 256, 512)
EXPANSION = 4
BN_EPS = 1e-5

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """``block='bottleneck'`` covers resnet50/101/152; ``'basic'`` covers
    resnet18/34 (reference ``src/resnet.py`` constructors).

    ``fused_stages``: 1-based stages whose stride-1 bottleneck runs execute
    through the fused Pallas chain kernel (ops/pallas_resnet.py) instead of
    per-conv XLA — the early-stage (C=64/128) lane-padding + HBM-round-trip
    fix from WORKLOG round 1.  Stage transitions (stride-2 block 0) stay on
    the XLA path.
    """

    compute_dtype: Any = jnp.float32
    blocks_per_stage: tuple[int, ...] = BLOCKS_PER_STAGE
    block: str = "bottleneck"
    fused_stages: tuple[int, ...] = ()
    # Run stem+maxpool+layer1 through the (C, P)-layout Pallas kernels
    # (ops/pallas_resnet.py stem16 / bottleneck_chain_cp): fixes the two
    # measured MXU-starvation points of the XLA lowering — the K=12 stem
    # GEMM and layer1's 64-channel lane padding.  Falls back to the XLA
    # path for basic blocks / odd input sizes.
    early_pallas: bool = False
    # Stage tails (1-indexed) run through the (C, P)-layout Pallas chain
    # kernel (channels on sublanes, pixels on lanes): for widths >= 128
    # (layer2+) every GEMM axis fills the MXU and the whole stride-1 run
    # stays VMEM-resident.  Entry/exit are NHWC<->(C, P) transposes.
    cp_stages: tuple[int, ...] = ()
    # AvgPool2d(7, stride=pool_stride): the reference's plain ResNet pools
    # with stride 7 (nn.AvgPool2d(7) default), but its RNfour/RNone
    # variants use nn.AvgPool2d(7, stride=1) (src/resnet.py:186,261)
    pool_stride: int = 7

    @property
    def expansion(self) -> int:
        return EXPANSION if self.block == "bottleneck" else 1

    @property
    def feature_dim(self) -> int:
        return STAGE_WIDTH[-1] * self.expansion  # 2048 / 512

    def feature_dim_for(self, img_h: int, img_w: int) -> int:
        """Output width of ``forward_extract`` for an input size — the
        reference's ``AvgPool2d(7)`` + flatten yields C*nh*nw, so inputs
        >= 448px produce MORE than ``feature_dim`` features (e.g. 512px
        -> 16x16 map -> 2x2 windows -> 8192), exactly like the
        reference's ``x.view(B, -1)``."""
        h, w = img_h, img_w
        for _ in range(5):  # stem conv s2, maxpool s2, layers 2-4 s2
            h, w = (h + 1) // 2, (w + 1) // 2
        if h >= 7 and w >= 7:
            s = self.pool_stride
            return self.feature_dim * (((h - 7) // s + 1)
                                       * ((w - 7) // s + 1))
        return self.feature_dim  # small maps: global-mean fallback

DEPTH_TO_STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                   101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def config_for_depth(depth: int, compute_dtype=jnp.float32) -> ResNetConfig:
    """resnet{18,34,50,101,152} configs (reference resnet.py constructors)."""
    return ResNetConfig(compute_dtype=compute_dtype,
                        blocks_per_stage=DEPTH_TO_STAGES[depth],
                        block="basic" if depth in (18, 34) else "bottleneck")


def _conv(x, w, stride=1, dtype=None):
    """NHWC conv with HWIO weights, torch 'same-ish' padding baked by caller."""
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2)) if kh > 1 else ((0, 0), (0, 0))
    from sequoia_tpu.ops.nn import accum_type

    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec, preferred_element_type=accum_type(x)).astype(x.dtype)


def _bn(x, p):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _bottleneck(x, p, stride):
    y = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    y = jax.nn.relu(_bn(_conv(y, p["conv2"], stride), p["bn2"]))
    y = _bn(_conv(y, p["conv3"]), p["bn3"])
    if "downsample_conv" in p:
        x = _bn(_conv(x, p["downsample_conv"], stride), p["downsample_bn"])
    return jax.nn.relu(y + x)


def _basic_block(x, p, stride):
    """torchvision BasicBlock (resnet18/34): two 3x3 convs, expansion 1."""
    y = jax.nn.relu(_bn(_conv(x, p["conv1"], stride), p["bn1"]))
    y = _bn(_conv(y, p["conv2"]), p["bn2"])
    if "downsample_conv" in p:
        x = _bn(_conv(x, p["downsample_conv"], stride), p["downsample_bn"])
    return jax.nn.relu(y + x)


def stem_space_to_depth(x: jax.Array, w_s2d: jax.Array) -> jax.Array:
    """7x7/s2 stem as space-to-depth(2) + 4x4/s1 conv — mathematically exact
    (the 7x7 kernel is zero-padded to 8x8 at the leading taps), and much
    friendlier to the MXU than a stride-2 conv over 3 channels.

    x: (B, H, W, 3) with H, W even; w_s2d: (4, 4, 12, 64) from
    ``fold_stem_to_s2d``.
    """
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h // 2, w // 2, 4 * c)  # channel order (di, dj, c)
    prec = (jax.lax.Precision.HIGHEST if xs.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # original: k=7 pad=3 stride 2 == k=8 pad(4,3) stride 2 with a zero
    # leading tap == block-space k=4 pad(2,1) stride 1.
    from sequoia_tpu.ops.nn import accum_type

    return jax.lax.conv_general_dilated(
        xs, w_s2d.astype(xs.dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec, preferred_element_type=accum_type(xs)).astype(xs.dtype)


def fold_stem_to_s2d(conv1: jax.Array) -> jax.Array:
    """(7, 7, 3, 64) stem kernel -> (4, 4, 12, 64) space-to-depth kernel."""
    w8 = jnp.pad(conv1, ((1, 0), (1, 0), (0, 0), (0, 0)))  # zero leading taps
    kh, kw, c, o = w8.shape
    w = w8.reshape(kh // 2, 2, kw // 2, 2, c, o)  # ti = 2*bi + di
    w = w.transpose(0, 2, 1, 3, 4, 5)             # (bi, bj, di, dj, c, o)
    return w.reshape(kh // 2, kw // 2, 4 * c, o)


def _early_pallas(cfg: ResNetConfig, params: Params, x: jax.Array) -> jax.Array:
    """stem + maxpool + layer1 in the (C, P) Pallas layout; returns NHWC."""
    from sequoia_tpu.ops import pallas_resnet

    interp = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    # space-to-depth channels in (di, dj, c) order — matching
    # fold_stem_to_s2d's input-channel layout — padded to a 16-sublane tile
    # plus 2 top / 1 bottom zero pad rows (the kernel's dy shifts become
    # plain lane offsets; it does the dx shifts with lane rolls in VMEM).
    xs = x.reshape(b, h2, 2, w2, 2, c).transpose(0, 2, 4, 5, 1, 3)
    x16 = jnp.pad(xs.reshape(b, 4 * c, h2, w2),
                  ((0, 0), (0, 4), (2, 1), (0, 0)))
    a, bias = pallas_resnet.fold_stem16_weights(params["conv1_s2d"],
                                                params["bn1"], x.dtype)
    y = pallas_resnet.stem16(x16.reshape(b, 16, (h2 + 3) * w2), a, bias,
                             H2=h2, W2=w2, interpret=interp)
    y = y.reshape(b, 64, h2, w2)
    # torch maxpool 3x3 stride 2 pad 1, NCHW
    y = jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
        jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    hp, wp = h2 // 2, w2 // 2
    flat, meta = pallas_resnet.stage_chain_weights_cp(params["layer1"], 0,
                                                      y.dtype)
    out = pallas_resnet.bottleneck_chain_cp(y.reshape(b, 64, hp * wp), flat,
                                            meta=meta, H=hp, W=wp,
                                            interpret=interp)
    return out.reshape(b, meta[-1][2], hp, wp).transpose(0, 2, 3, 1)


def forward_extract(cfg: ResNetConfig, params: Params, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized float -> (B, 2048) pooled features
    (reference ``resnet.py`` forward_extract)."""
    x = images.astype(cfg.compute_dtype)
    start_stage = 0
    if (cfg.early_pallas and cfg.block == "bottleneck"
            and x.shape[3] == 3  # _early_pallas hardcodes the 12->16 pad;
            # non-RGB stems (RNfour/RNone) take the general paths below
            and "conv1_s2d" in params and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
            and (x.shape[2] % 256 == 0  # DMA lane alignment (stem16)
                 or jax.default_backend() != "tpu")):
        x = _early_pallas(cfg, params, x)
        start_stage = 1
    elif "conv1_s2d" in params and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = jax.nn.relu(_bn(stem_space_to_depth(x, params["conv1_s2d"]),
                            params["bn1"]))
    else:
        x = jax.nn.relu(_bn(_conv(x, params["conv1"], stride=2), params["bn1"]))
    if start_stage == 0:
        # torch maxpool 3x3 stride 2 pad 1
        x = jax.lax.reduce_window(
            x, -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
            jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
    block_fn = _bottleneck if cfg.block == "bottleneck" else _basic_block
    for s, nblocks in enumerate(cfg.blocks_per_stage):
        if s < start_stage:
            continue
        blocks = params[f"layer{s + 1}"]
        start = 0
        if s > 0:  # stride-2 transition block stays on the XLA conv path
            x = block_fn(x, blocks[0], 2)
            start = 1
        if (cfg.block == "bottleneck" and (s + 1) in cfg.fused_stages
                and len(blocks) > start):
            x = _fused_chain(x, blocks, start)
        elif (cfg.block == "bottleneck" and (s + 1) in cfg.cp_stages
                and len(blocks) > start):
            x = _fused_chain_cp(x, blocks, start)
        else:
            for b in range(start, len(blocks)):
                x = block_fn(x, blocks[b], 1)
    x = x.astype(jnp.float32)
    h, w = x.shape[1], x.shape[2]
    if h >= 7 and w >= 7:
        # reference src/resnet.py:110,155-170: nn.AvgPool2d(7) — FIXED
        # 7x7 windows (stride 7 for the plain ResNet, stride 1 for the
        # RNfour/RNone variants via cfg.pool_stride), not adaptive/global
        # pooling.  At the production 256px patch the layer4 map is 8x8,
        # so the reference pools ONLY the top-left 7x7 window (last
        # row/col discarded); its released checkpoints were trained on
        # those features, so the quirk is load-bearing (caught by the
        # parity gate driving the reference's own compute_features_hdf5).
        s = cfg.pool_stride
        p = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 7, 7, 1), (1, s, s, 1), "VALID") / 49.0
        # torch flattens NCHW -> (B, C*nh*nw) channel-major
        return p.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    # maps smaller than the 7x7 kernel would crash the reference's
    # AvgPool2d; keep global mean for these (tiny test configs only)
    return jnp.mean(x, axis=(1, 2))


def _fused_chain(x: jax.Array, blocks, start: int) -> jax.Array:
    """Run blocks[start:] (all stride 1) through the fused Pallas chain."""
    from sequoia_tpu.ops import pallas_resnet

    b, h, w, _ = x.shape
    flat, meta = pallas_resnet.stage_chain_weights(blocks, start, x.dtype)
    # chunk rows so per-chunk VMEM stays bounded (whole rows: R % W == 0)
    target = 512 if x.dtype == jnp.bfloat16 else 256
    rows = min(h, max(1, target // w))
    chunk = w * rows
    p = h * w
    while p % chunk:
        rows -= 1
        chunk = w * rows
    out = pallas_resnet.bottleneck_chain(
        x.reshape(b, p, x.shape[3]), flat, meta=meta, H=h, W=w,
        row_chunk=chunk, interpret=jax.default_backend() != "tpu")
    return out.reshape(b, h, w, meta[-1][2])


def _fused_chain_cp(x: jax.Array, blocks, start: int) -> jax.Array:
    """Run blocks[start:] (all stride 1) through the (C, P)-layout chain."""
    from sequoia_tpu.ops import pallas_resnet

    b, h, w, cin = x.shape
    flat, meta = pallas_resnet.stage_chain_weights_cp(blocks, start, x.dtype)
    out = pallas_resnet.bottleneck_chain_cp(
        x.transpose(0, 3, 1, 2).reshape(b, cin, h * w), flat, meta=meta,
        H=h, W=w, interpret=jax.default_backend() != "tpu")
    return out.reshape(b, meta[-1][2], h, w).transpose(0, 2, 3, 1)


def preprocess_uint8(images_u8: jax.Array) -> jax.Array:
    """uint8 (B,H,W,3) -> ImageNet-normalized f32 (the reference's
    ConvertImageDtype + Normalize, fused on device)."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def extract_from_uint8(cfg: ResNetConfig, params: Params,
                       images_u8: jax.Array) -> jax.Array:
    return forward_extract(cfg, params, preprocess_uint8(images_u8))


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _fold_bn(sd, prefix) -> dict[str, jnp.ndarray]:
    gamma = _np(sd[prefix + ".weight"])
    beta = _np(sd[prefix + ".bias"])
    mean = _np(sd[prefix + ".running_mean"])
    var = _np(sd[prefix + ".running_var"])
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(beta - mean * scale)}


def _conv_w(sd, name) -> jnp.ndarray:
    # torch OIHW -> HWIO
    return jnp.asarray(_np(sd[name]).transpose(2, 3, 1, 0))


def enable_s2d_stem(params: Params) -> Params:
    """Attach the space-to-depth stem kernel (used automatically for
    even-sized inputs; ``conv1`` is kept for the general path)."""
    if params["conv1"].shape[:2] == (7, 7):
        params = dict(params)
        params["conv1_s2d"] = fold_stem_to_s2d(params["conv1"])
    return params


def resnet_from_torch(sd) -> tuple[ResNetConfig, Params]:
    """torchvision ResNet state dict (any depth) -> (config, pytree)."""
    params: Params = {
        "conv1": _conv_w(sd, "conv1.weight"),
        "bn1": _fold_bn(sd, "bn1"),
    }
    blocks_per_stage = []
    has_conv3 = "layer1.0.conv3.weight" in sd
    for s in range(4):
        layer = []
        b = 0
        while f"layer{s + 1}.{b}.conv1.weight" in sd:
            pre = f"layer{s + 1}.{b}."
            blk = {
                "conv1": _conv_w(sd, pre + "conv1.weight"),
                "bn1": _fold_bn(sd, pre + "bn1"),
                "conv2": _conv_w(sd, pre + "conv2.weight"),
                "bn2": _fold_bn(sd, pre + "bn2"),
            }
            if has_conv3:
                blk["conv3"] = _conv_w(sd, pre + "conv3.weight")
                blk["bn3"] = _fold_bn(sd, pre + "bn3")
            if pre + "downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv_w(sd, pre + "downsample.0.weight")
                blk["downsample_bn"] = _fold_bn(sd, pre + "downsample.1")
            layer.append(blk)
            b += 1
        blocks_per_stage.append(b)
        params[f"layer{s + 1}"] = layer
    cfg = ResNetConfig(blocks_per_stage=tuple(blocks_per_stage),
                       block="bottleneck" if has_conv3 else "basic")
    return cfg, enable_s2d_stem(params)


def resnet50_from_torch(sd) -> Params:
    """torchvision resnet50 state dict -> our NHWC/folded-BN pytree."""
    return resnet_from_torch(sd)[1]


def random_params(key, dtype=jnp.float32) -> Params:
    """He-normal random weights (for tests / benchmarking without the
    torchvision zoo download)."""
    def conv(key, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return (jax.random.normal(key, (kh, kw, cin, cout), dtype)
                * np.sqrt(2.0 / fan_in))

    def bn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params: Params = {"conv1": conv(next(ki), 7, 7, 3, 64), "bn1": bn(64)}
    cin = 64
    for s, nblocks in enumerate(BLOCKS_PER_STAGE):
        width = STAGE_WIDTH[s]
        cout = width * EXPANSION
        layer = []
        for b in range(nblocks):
            blk = {
                "conv1": conv(next(ki), 1, 1, cin, width), "bn1": bn(width),
                "conv2": conv(next(ki), 3, 3, width, width), "bn2": bn(width),
                "conv3": conv(next(ki), 1, 1, width, cout), "bn3": bn(cout),
            }
            if b == 0:
                blk["downsample_conv"] = conv(next(ki), 1, 1, cin, cout)
                blk["downsample_bn"] = bn(cout)
            layer.append(blk)
            cin = cout
        params[f"layer{s + 1}"] = layer
    return enable_s2d_stem(params)


# ---------------------------------------------------------------------------
# Variants (reference src/resnet.py RNfour / RNone / ResNetProject — unused
# by the main pipeline but part of the API surface)
# ---------------------------------------------------------------------------

def random_params_channels(key, in_channels: int, dtype=jnp.float32) -> Params:
    """ResNet-50 with a non-RGB stem (4-channel fluorescence / 1-channel
    grayscale variants)."""
    params = random_params(key, dtype)
    kh, kw, _, cout = params["conv1"].shape
    fan_in = kh * kw * in_channels
    params["conv1"] = (jax.random.normal(key, (kh, kw, in_channels, cout), dtype)
                       * np.sqrt(2.0 / fan_in))
    # random_params already folded a 3-channel s2d stem; rebuild it for the
    # new conv1 (the stale kernel crashed the s2d path on even-sized inputs)
    params.pop("conv1_s2d", None)
    return enable_s2d_stem(params)


def resnet50_4channel(key=None, sd=None) -> Params:
    """4-channel-input ResNet-50 (reference ``RNfour``).  Run with
    ``ResNetConfig(pool_stride=1)``: RNfour pools ``AvgPool2d(7, stride=1)``
    (``src/resnet.py:186``), unlike the plain ResNet's stride-7."""
    if sd is not None:
        return resnet50_from_torch(sd)
    return random_params_channels(key, 4)


def resnet50_1channel(key=None, sd=None) -> Params:
    """1-channel-input ResNet-50 (reference ``RNone``).  Run with
    ``ResNetConfig(pool_stride=1)`` (``src/resnet.py:261``)."""
    if sd is not None:
        return resnet50_from_torch(sd)
    return random_params_channels(key, 1)


@dataclasses.dataclass(frozen=True)
class ResNetProjectConfig:
    """Reference ``ResNetProject``: backbone embedding -> Linear(hdim) ->
    tanh -> dropout -> Linear(1)."""

    hdim: int = 200
    input_dim: int = 2048
    dropout: float = 0.3
    compute_dtype: Any = jnp.float32


def resnet_project_init(cfg: ResNetProjectConfig, key) -> Params:
    from sequoia_tpu.utils import torch_init

    k1, k2 = jax.random.split(key)
    pw, pb = torch_init.linear_params(k1, cfg.input_dim, cfg.hdim)
    fw, fb = torch_init.linear_params(k2, cfg.hdim, 1)
    return {"project_w": pw, "project_b": pb, "fc_w": fw, "fc_b": fb}


def resnet_project_extract(cfg: ResNetProjectConfig, proj_params: Params,
                           backbone_params: Params, images: jax.Array, *,
                           train: bool = False, rng=None) -> jax.Array:
    feats = forward_extract(ResNetConfig(cfg.compute_dtype), backbone_params,
                            images)
    x = jnp.tanh(feats @ proj_params["project_w"] + proj_params["project_b"])
    if train and cfg.dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)
    return x


def resnet_project_forward(cfg: ResNetProjectConfig, proj_params: Params,
                           backbone_params: Params, images: jax.Array, *,
                           train: bool = False, rng=None) -> jax.Array:
    x = resnet_project_extract(cfg, proj_params, backbone_params, images,
                               train=train, rng=rng)
    return x @ proj_params["fc_w"] + proj_params["fc_b"]
