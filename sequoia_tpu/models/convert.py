"""Torch state-dict <-> JAX parameter-pytree converters.

The reference publishes ViS fold weights on HuggingFace
(``gevaertlab/sequoia-{cancer}-{fold}``) and saves local checkpoints as torch
``state_dict`` ``.pt`` files (reference ``src/vit.py`` train save;
``src/he2rna.py`` whole-module pickle).  These converters are the
compatibility contract in both directions:

* ``*_from_torch``: a mapping ``{torch_param_name: array}`` -> our stacked
  TPU-native pytree.  Accepts numpy arrays or torch tensors.
* ``*_to_torch``: our pytree -> an ordered ``{torch_param_name: numpy}``
  mapping, loadable with ``module.load_state_dict`` by the reference code.

Torch module name schema (reference ``src/tformer_lin.py:86-94``):
    pos_emb1D
    transformer.layers.{i}.0.mixers.{h}.{f,s,c}.{weight,bias}
    transformer.layers.{i}.0.mixers.{h}.{local_norm,summary_norm}.{weight,bias}
    transformer.layers.{i}.0.projection.{weight,bias}
    transformer.layers.{i}.1.net.{0,1,3}.{weight,bias}
    linear_head.{0,1}.{weight,bias}
and for ViT (reference ``src/vit.py:49-104``):
    transformer.layers.{i}.0.norm.{weight,bias}
    transformer.layers.{i}.0.{to_qkv,to_out}.weight
and for HE2RNA (reference ``src/he2rna.py:64-75``): ``conv{i}.{weight,bias}``
with Conv1d kernels of shape (out, in, 1).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import jax.numpy as jnp

from sequoia_tpu.models.he2rna import HE2RNAConfig
from sequoia_tpu.models.vis import ViSConfig
from sequoia_tpu.models.vit import ViTConfig


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# ViS
# ---------------------------------------------------------------------------

def vis_config_from_state_dict(sd) -> ViSConfig:
    """Infer the architecture from a torch state dict's shapes."""
    pos = _np(sd["pos_emb1D"])
    num_clusters, input_dim = pos.shape
    depth = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.layers."))
    nheads = 1 + max(int(k.split(".")[5]) for k in sd if ".mixers." in k)
    dim_f = tuple(sd["transformer.layers.0.0.mixers.0.f.weight"].shape)[0]
    dim_s = tuple(sd["transformer.layers.0.0.mixers.0.s.weight"].shape)[0]
    dim_c = tuple(sd["transformer.layers.0.0.mixers.0.c.weight"].shape)[0]
    num_outputs = tuple(sd["linear_head.1.weight"].shape)[0]
    return ViSConfig(num_outputs=num_outputs, input_dim=input_dim, depth=depth,
                     nheads=nheads, dim_f=dim_f, dim_s=dim_s, dim_c=dim_c,
                     num_clusters=num_clusters)


def vis_from_torch(sd, cfg: ViSConfig | None = None):
    """Torch ViS state dict -> (cfg, params) in our stacked layout."""
    if cfg is None:
        cfg = vis_config_from_state_dict(sd)
    D, H = cfg.input_dim, cfg.nheads

    def get(name):
        return _np(sd[name])

    blocks: dict[str, list[np.ndarray]] = {k: [] for k in (
        "wf", "bf", "ws", "bs", "wc", "bc",
        "ln_f_scale", "ln_f_bias", "ln_s_scale", "ln_s_bias",
        "wproj", "bproj", "ln_ff_scale", "ln_ff_bias", "w1", "b1", "w2", "b2")}

    for i in range(cfg.depth):
        mix = f"transformer.layers.{i}.0."
        # fuse per-head f/s linears: torch weight (out=df, in=D) -> (D, df),
        # heads concatenated on the output axis.
        blocks["wf"].append(np.concatenate(
            [get(mix + f"mixers.{h}.f.weight").T for h in range(H)], axis=1))
        blocks["bf"].append(np.concatenate(
            [get(mix + f"mixers.{h}.f.bias") for h in range(H)]))
        blocks["ws"].append(np.concatenate(
            [get(mix + f"mixers.{h}.s.weight").T for h in range(H)], axis=1))
        blocks["bs"].append(np.concatenate(
            [get(mix + f"mixers.{h}.s.bias") for h in range(H)]))
        blocks["wc"].append(np.stack(
            [get(mix + f"mixers.{h}.c.weight").T for h in range(H)]))
        blocks["bc"].append(np.stack(
            [get(mix + f"mixers.{h}.c.bias") for h in range(H)]))
        blocks["ln_f_scale"].append(np.stack(
            [get(mix + f"mixers.{h}.local_norm.weight") for h in range(H)]))
        blocks["ln_f_bias"].append(np.stack(
            [get(mix + f"mixers.{h}.local_norm.bias") for h in range(H)]))
        blocks["ln_s_scale"].append(np.stack(
            [get(mix + f"mixers.{h}.summary_norm.weight") for h in range(H)]))
        blocks["ln_s_bias"].append(np.stack(
            [get(mix + f"mixers.{h}.summary_norm.bias") for h in range(H)]))
        blocks["wproj"].append(get(mix + "projection.weight").T)
        blocks["bproj"].append(get(mix + "projection.bias"))

        ff = f"transformer.layers.{i}.1.net."
        blocks["ln_ff_scale"].append(get(ff + "0.weight"))
        blocks["ln_ff_bias"].append(get(ff + "0.bias"))
        blocks["w1"].append(get(ff + "1.weight").T)
        blocks["b1"].append(get(ff + "1.bias"))
        blocks["w2"].append(get(ff + "3.weight").T)
        blocks["b2"].append(get(ff + "3.bias"))

    params = {
        "pos_emb": jnp.asarray(get("pos_emb1D")),
        "blocks": {k: jnp.asarray(np.stack(v)) for k, v in blocks.items()},
        "head_ln_scale": jnp.asarray(get("linear_head.0.weight")),
        "head_ln_bias": jnp.asarray(get("linear_head.0.bias")),
        "head_w": jnp.asarray(get("linear_head.1.weight").T),
        "head_b": jnp.asarray(get("linear_head.1.bias")),
    }
    return cfg, params


def vis_to_torch(cfg: ViSConfig, params) -> "OrderedDict[str, np.ndarray]":
    """Our ViS pytree -> torch-named state dict (numpy values)."""
    H, df, ds, dc = cfg.nheads, cfg.dim_f, cfg.dim_s, cfg.dim_c
    b = {k: np.asarray(v) for k, v in params["blocks"].items()}
    sd: OrderedDict[str, np.ndarray] = OrderedDict()
    sd["pos_emb1D"] = np.asarray(params["pos_emb"])
    for i in range(cfg.depth):
        mix = f"transformer.layers.{i}.0."
        for h in range(H):
            sd[mix + f"mixers.{h}.local_norm.weight"] = b["ln_f_scale"][i, h]
            sd[mix + f"mixers.{h}.local_norm.bias"] = b["ln_f_bias"][i, h]
            sd[mix + f"mixers.{h}.summary_norm.weight"] = b["ln_s_scale"][i, h]
            sd[mix + f"mixers.{h}.summary_norm.bias"] = b["ln_s_bias"][i, h]
            sd[mix + f"mixers.{h}.s.weight"] = b["ws"][i][:, h * ds:(h + 1) * ds].T
            sd[mix + f"mixers.{h}.s.bias"] = b["bs"][i][h * ds:(h + 1) * ds]
            sd[mix + f"mixers.{h}.f.weight"] = b["wf"][i][:, h * df:(h + 1) * df].T
            sd[mix + f"mixers.{h}.f.bias"] = b["bf"][i][h * df:(h + 1) * df]
            sd[mix + f"mixers.{h}.c.weight"] = b["wc"][i, h].T
            sd[mix + f"mixers.{h}.c.bias"] = b["bc"][i, h]
        sd[mix + "projection.weight"] = b["wproj"][i].T
        sd[mix + "projection.bias"] = b["bproj"][i]
        ff = f"transformer.layers.{i}.1.net."
        sd[ff + "0.weight"] = b["ln_ff_scale"][i]
        sd[ff + "0.bias"] = b["ln_ff_bias"][i]
        sd[ff + "1.weight"] = b["w1"][i].T
        sd[ff + "1.bias"] = b["b1"][i]
        sd[ff + "3.weight"] = b["w2"][i].T
        sd[ff + "3.bias"] = b["b2"][i]
    sd["linear_head.0.weight"] = np.asarray(params["head_ln_scale"])
    sd["linear_head.0.bias"] = np.asarray(params["head_ln_bias"])
    sd["linear_head.1.weight"] = np.asarray(params["head_w"]).T
    sd["linear_head.1.bias"] = np.asarray(params["head_b"])
    return sd


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

def vit_config_from_state_dict(sd) -> ViTConfig:
    pos = _np(sd["pos_emb1D"])
    num_clusters, dim = pos.shape
    depth = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.layers."))
    inner3 = tuple(sd["transformer.layers.0.0.to_qkv.weight"].shape)[0]
    mlp_dim = tuple(sd["transformer.layers.0.1.net.1.weight"].shape)[0]
    num_outputs = tuple(sd["linear_head.1.weight"].shape)[0]
    inner = inner3 // 3
    # dim_head defaults to 64 in every reference call site; recover heads from it.
    dim_head = 64 if inner % 64 == 0 else inner
    return ViTConfig(num_outputs=num_outputs, dim=dim, depth=depth,
                     heads=inner // dim_head, dim_head=dim_head,
                     mlp_dim=mlp_dim, num_clusters=num_clusters)


def vit_from_torch(sd, cfg: ViTConfig | None = None):
    if cfg is None:
        cfg = vit_config_from_state_dict(sd)

    def get(name):
        return _np(sd[name])

    blocks: dict[str, list[np.ndarray]] = {k: [] for k in (
        "ln_attn_scale", "ln_attn_bias", "w_qkv", "w_out",
        "ln_ff_scale", "ln_ff_bias", "w1", "b1", "w2", "b2")}
    for i in range(cfg.depth):
        attn = f"transformer.layers.{i}.0."
        blocks["ln_attn_scale"].append(get(attn + "norm.weight"))
        blocks["ln_attn_bias"].append(get(attn + "norm.bias"))
        blocks["w_qkv"].append(get(attn + "to_qkv.weight").T)
        blocks["w_out"].append(get(attn + "to_out.weight").T)
        ff = f"transformer.layers.{i}.1.net."
        blocks["ln_ff_scale"].append(get(ff + "0.weight"))
        blocks["ln_ff_bias"].append(get(ff + "0.bias"))
        blocks["w1"].append(get(ff + "1.weight").T)
        blocks["b1"].append(get(ff + "1.bias"))
        blocks["w2"].append(get(ff + "3.weight").T)
        blocks["b2"].append(get(ff + "3.bias"))

    params = {
        "pos_emb": jnp.asarray(get("pos_emb1D")),
        "blocks": {k: jnp.asarray(np.stack(v)) for k, v in blocks.items()},
        "head_ln_scale": jnp.asarray(get("linear_head.0.weight")),
        "head_ln_bias": jnp.asarray(get("linear_head.0.bias")),
        "head_w": jnp.asarray(get("linear_head.1.weight").T),
        "head_b": jnp.asarray(get("linear_head.1.bias")),
    }
    return cfg, params


def vit_to_torch(cfg: ViTConfig, params) -> "OrderedDict[str, np.ndarray]":
    b = {k: np.asarray(v) for k, v in params["blocks"].items()}
    sd: OrderedDict[str, np.ndarray] = OrderedDict()
    sd["pos_emb1D"] = np.asarray(params["pos_emb"])
    for i in range(cfg.depth):
        attn = f"transformer.layers.{i}.0."
        sd[attn + "norm.weight"] = b["ln_attn_scale"][i]
        sd[attn + "norm.bias"] = b["ln_attn_bias"][i]
        sd[attn + "to_qkv.weight"] = b["w_qkv"][i].T
        sd[attn + "to_out.weight"] = b["w_out"][i].T
        ff = f"transformer.layers.{i}.1.net."
        sd[ff + "0.weight"] = b["ln_ff_scale"][i]
        sd[ff + "0.bias"] = b["ln_ff_bias"][i]
        sd[ff + "1.weight"] = b["w1"][i].T
        sd[ff + "1.bias"] = b["b1"][i]
        sd[ff + "3.weight"] = b["w2"][i].T
        sd[ff + "3.bias"] = b["b2"][i]
    sd["linear_head.0.weight"] = np.asarray(params["head_ln_scale"])
    sd["linear_head.0.bias"] = np.asarray(params["head_ln_bias"])
    sd["linear_head.1.weight"] = np.asarray(params["head_w"]).T
    sd["linear_head.1.bias"] = np.asarray(params["head_b"])
    return sd


# ---------------------------------------------------------------------------
# HE2RNA
# ---------------------------------------------------------------------------

def he2rna_config_from_state_dict(sd, ks=(1, 2, 5, 10, 20, 50, 100)) -> HE2RNAConfig:
    n = 0
    while f"conv{n}.weight" in sd:
        n += 1
    if "__ks__" in sd:
        # whole-module pickles carry the trained ks sweep (preserved by
        # checkpoint._to_numpy_sd); a model trained with a non-default
        # sweep must eval with ITS sweep, not the CLI default
        ks = tuple(int(k) for k in np.asarray(sd["__ks__"]).tolist())
    dims = [tuple(sd["conv0.weight"].shape)[1]]
    dims += [tuple(sd[f"conv{i}.weight"].shape)[0] for i in range(n)]
    return HE2RNAConfig(input_dim=dims[0], output_dim=dims[-1],
                        layers=tuple(dims[1:-1]), ks=tuple(ks))


def he2rna_from_torch(sd, cfg: HE2RNAConfig | None = None):
    if cfg is None:
        cfg = he2rna_config_from_state_dict(sd)
    n_layers = len(cfg.layers) + 1
    ws, bs = [], []
    for i in range(n_layers):
        w = _np(sd[f"conv{i}.weight"])  # (out, in, 1) Conv1d kernel
        ws.append(jnp.asarray(w[:, :, 0].T))
        bs.append(jnp.asarray(_np(sd[f"conv{i}.bias"])))
    return cfg, {"w": ws, "b": bs}


def he2rna_to_torch(cfg: HE2RNAConfig, params) -> "OrderedDict[str, np.ndarray]":
    sd: OrderedDict[str, np.ndarray] = OrderedDict()
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        sd[f"conv{i}.weight"] = np.asarray(w).T[:, :, None]
        sd[f"conv{i}.bias"] = np.asarray(b)
    return sd
