"""UNI backbone: ViT-L/16 (timm ``vit_large_patch16_224`` with
``init_values=1e-5`` layer-scale, ``num_classes=0``) in JAX.

Behavior contract (reference ``pre_processing/compute_features_hdf5.py``
uni path): a 224x224 ImageNet-normalized patch -> 1024-d embedding = the
final-norm CLS token (timm's ``global_pool='token'`` head with an Identity
classifier).  Weights load from the MahmoodLab UNI ``pytorch_model.bin``
state dict via ``uni_from_torch`` (timm parameter names).

Architecture (timm VisionTransformer): 16x16 conv patch embed, CLS token,
learned position embedding over 197 tokens, 24 pre-norm blocks of MHA
(qkv bias, 16 heads) + MLP(4096, exact GELU), LayerScale (``ls1``/``ls2``
gamma) after each branch, final LayerNorm.

TPU-first: the patch embed runs as a reshape + one (768 -> 1024) GEMM
(16x16x3 pixels per token) instead of a conv — identical math, direct MXU
mapping; blocks are stacked + scanned; attention is the standard batched
einsum (197 tokens — no flash machinery needed).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sequoia_tpu.ops.nn import einsum, gelu, layer_norm, linear

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UniViTConfig:
    img_size: int = 224
    patch_size: int = 16
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    compute_dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def tokens(self) -> int:
        return self.grid * self.grid + 1

    @property
    def dim_head(self) -> int:
        return self.dim // self.heads


def _block(cfg: UniViTConfig, x: jax.Array, bp: dict[str, jax.Array]) -> jax.Array:
    b, n, d = x.shape
    h, dh = cfg.heads, cfg.dim_head

    y = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"])
    qkv = linear(y, bp["w_qkv"], bp["b_qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    scores = einsum("bhnd,bhmd->bhnm", q, k) * (dh ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = einsum("bhnm,bhmd->bhnd", attn, v).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    out = linear(out, bp["w_proj"], bp["b_proj"])
    # cast the LayerScale gammas DOWN: strong-typed f32 params (from
    # uni_from_torch's numpy arrays) would promote a bf16 activation to
    # f32 and break the scan carry dtype (random_params' weak-typed ones
    # masked this — the real-weights bf16 path crashed)
    x = x + out * bp["ls1"].astype(out.dtype)

    y = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"])
    y = gelu(linear(y, bp["w_fc1"], bp["b_fc1"]))
    y = linear(y, bp["w_fc2"], bp["b_fc2"])
    return x + y * bp["ls2"].astype(y.dtype)


def forward(cfg: UniViTConfig, params: Params, images: jax.Array) -> jax.Array:
    """(B, 224, 224, 3) normalized NHWC float -> (B, 1024) CLS embedding."""
    b = images.shape[0]
    p, g = cfg.patch_size, cfg.grid
    x = images.astype(cfg.compute_dtype)
    # conv patch-embed as reshape + GEMM: (B, g, p, g, p, 3) -> (B, g*g, p*p*3)
    x = x.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, p * p * 3)
    x = linear(x, params["patch_w"], params["patch_b"])  # (B, N-1, D)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"].astype(x.dtype)

    def body(carry, bp):
        return _block(cfg, carry, bp), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["norm_scale"], params["norm_bias"])
    return x[:, 0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def uni_from_torch(sd, cfg: UniViTConfig | None = None, *,
                   heads: int | None = None) -> tuple[UniViTConfig, Params]:
    """timm ``vit_large_patch16_224`` state dict -> our pytree.

    The conv patch-embed kernel (D, 3, p, p) is re-laid-out to match the
    reshape+GEMM token order (p_row, p_col, channel).

    The head count is NOT recoverable from a fused-qkv state dict; it is
    inferred as 16 only for the ViT-L width (dim 1024 — the UNI backbone,
    ``compute_features_hdf5.py:62-68``).  Any other width must supply
    ``cfg`` or ``heads`` explicitly rather than silently computing a
    wrong attention partition.
    """
    if cfg is None:
        d = _np(sd["cls_token"]).shape[-1]
        if heads is None:
            if d != 1024:
                raise ValueError(
                    f"cannot infer the head count for dim={d} (a fused-qkv "
                    f"state dict does not record it); pass cfg= or heads=")
            heads = 16
        depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
        mlp = _np(sd["blocks.0.mlp.fc1.weight"]).shape[0]
        p = _np(sd["patch_embed.proj.weight"]).shape[-1]
        n_tok = _np(sd["pos_embed"]).shape[1]
        img = int(round(((n_tok - 1) ** 0.5))) * p
        cfg = UniViTConfig(img_size=img, patch_size=p, dim=d, depth=depth,
                           heads=heads, mlp_dim=mlp)

    w = _np(sd["patch_embed.proj.weight"])  # (D, 3, p, p)
    patch_w = w.transpose(2, 3, 1, 0).reshape(-1, cfg.dim)  # (p*p*3, D)

    keys = ("ln1_scale", "ln1_bias", "w_qkv", "b_qkv", "w_proj", "b_proj",
            "ls1", "ln2_scale", "ln2_bias", "w_fc1", "b_fc1", "w_fc2",
            "b_fc2", "ls2")
    blocks: dict[str, list[np.ndarray]] = {k: [] for k in keys}
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blocks["ln1_scale"].append(_np(sd[pre + "norm1.weight"]))
        blocks["ln1_bias"].append(_np(sd[pre + "norm1.bias"]))
        blocks["w_qkv"].append(_np(sd[pre + "attn.qkv.weight"]).T)
        blocks["b_qkv"].append(_np(sd[pre + "attn.qkv.bias"]))
        blocks["w_proj"].append(_np(sd[pre + "attn.proj.weight"]).T)
        blocks["b_proj"].append(_np(sd[pre + "attn.proj.bias"]))
        blocks["ls1"].append(_np(sd[pre + "ls1.gamma"]))
        blocks["ln2_scale"].append(_np(sd[pre + "norm2.weight"]))
        blocks["ln2_bias"].append(_np(sd[pre + "norm2.bias"]))
        blocks["w_fc1"].append(_np(sd[pre + "mlp.fc1.weight"]).T)
        blocks["b_fc1"].append(_np(sd[pre + "mlp.fc1.bias"]))
        blocks["w_fc2"].append(_np(sd[pre + "mlp.fc2.weight"]).T)
        blocks["b_fc2"].append(_np(sd[pre + "mlp.fc2.bias"]))
        blocks["ls2"].append(_np(sd[pre + "ls2.gamma"]))

    params: Params = {
        "patch_w": jnp.asarray(patch_w),
        "patch_b": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
        "cls_token": jnp.asarray(_np(sd["cls_token"]).reshape(1, cfg.dim)),
        "pos_emb": jnp.asarray(_np(sd["pos_embed"]).reshape(cfg.tokens, cfg.dim)),
        "blocks": {k: jnp.asarray(np.stack(v)) for k, v in blocks.items()},
        "norm_scale": jnp.asarray(_np(sd["norm.weight"])),
        "norm_bias": jnp.asarray(_np(sd["norm.bias"])),
    }
    return cfg, params


def random_params(cfg: UniViTConfig, key) -> Params:
    """Random weights at the UNI architecture (tests / benches)."""
    ks = jax.random.split(key, 8)
    d, mlp, depth = cfg.dim, cfg.mlp_dim, cfg.depth
    pdim = cfg.patch_size * cfg.patch_size * 3

    def nrm(k, shape, scale):
        return jax.random.normal(k, shape, jnp.float32) * scale

    blocks = {
        "ln1_scale": jnp.ones((depth, d)), "ln1_bias": jnp.zeros((depth, d)),
        "w_qkv": nrm(ks[0], (depth, d, 3 * d), d ** -0.5),
        "b_qkv": jnp.zeros((depth, 3 * d)),
        "w_proj": nrm(ks[1], (depth, d, d), d ** -0.5),
        "b_proj": jnp.zeros((depth, d)),
        "ls1": jnp.full((depth, d), 1e-5),
        "ln2_scale": jnp.ones((depth, d)), "ln2_bias": jnp.zeros((depth, d)),
        "w_fc1": nrm(ks[2], (depth, d, mlp), d ** -0.5),
        "b_fc1": jnp.zeros((depth, mlp)),
        "w_fc2": nrm(ks[3], (depth, mlp, d), mlp ** -0.5),
        "b_fc2": jnp.zeros((depth, d)),
        "ls2": jnp.full((depth, d), 1e-5),
    }
    return {
        "patch_w": nrm(ks[4], (pdim, d), pdim ** -0.5),
        "patch_b": jnp.zeros((d,)),
        "cls_token": nrm(ks[5], (1, d), 0.02),
        "pos_emb": nrm(ks[6], (cfg.tokens, d), 0.02),
        "blocks": blocks,
        "norm_scale": jnp.ones((d,)),
        "norm_bias": jnp.zeros((d,)),
    }


def extract_from_uint8(cfg: UniViTConfig, params: Params,
                       u8: "jax.Array") -> "jax.Array":
    """uint8 patches -> UNI features with the reference preprocessing
    (``compute_features_hdf5.py:53-56`` order: PIL Resize(224) on the uint8
    image — bit-exact Pillow BILINEAR on the MXU — THEN ToTensor+Normalize).
    The ONE implementation shared by the streaming extractor, the fused
    slide program, and the bench (so preprocessing cannot drift)."""
    from sequoia_tpu.models import resnet as _resnet
    from sequoia_tpu.ops import pil_resize as _pil

    if u8.shape[1] != cfg.img_size or u8.shape[2] != cfg.img_size:
        u8 = _pil.resize_u8(u8, cfg.img_size, cfg.img_size)
    x = u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(_resnet.IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_resnet.IMAGENET_STD, jnp.float32)
    return forward(cfg, params, (x - mean) / std)
