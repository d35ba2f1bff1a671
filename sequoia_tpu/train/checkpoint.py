"""Checkpoint interchange with the reference's torch formats.

Contracts:
* ViS/ViT: ``torch.save(model.state_dict(), 'model_best_{split}.pt')``
  (reference ``src/vit.py`` train save) — plain name->tensor dicts.
* HE2RNA: ``torch.save(model, ...)`` — a WHOLE-MODULE pickle (reference
  ``src/he2rna.py`` fit save).  Loading that without the reference class on
  the path needs an unpickler shim that substitutes a generic nn.Module for
  the missing ``he2rna.HE2RNA`` class; ``load_torch_checkpoint`` handles
  both forms and always returns a flat ``{name: np.ndarray}`` state dict.
* HuggingFace hub layout (``gevaertlab/sequoia-{cancer}-{fold}``): a local
  snapshot directory containing ``pytorch_model.bin`` or
  ``model.safetensors`` (PyTorchModelHubMixin format).  Zero-egress
  environments pass a local path; with network access the repo id resolves
  through ``huggingface_hub``.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def _to_numpy_sd(obj) -> dict[str, np.ndarray]:
    import torch

    extra = {}
    if isinstance(obj, torch.nn.Module):
        # whole-module pickles (reference he2rna.py:301) carry non-tensor
        # hyperparameters the state dict drops; preserve ks so a model
        # trained with a non-default sweep evals with ITS sweep
        if hasattr(obj, "ks"):
            try:
                extra["__ks__"] = np.asarray([int(k) for k in obj.ks])
            except (TypeError, ValueError):
                pass
        obj = obj.state_dict()
    out = dict(extra)
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _shimmed_torch_load(path: str):
    import torch

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                import torch.nn as nn

                # Unpickling bypasses __init__ (cls.__new__ + state restore),
                # so a bare nn.Module subclass restores the attribute tree and
                # state_dict() works.
                return type(name, (nn.Module,), {})

    with open(path, "rb") as f:
        return torch.load(f, map_location="cpu", weights_only=False,
                          pickle_module=_PickleShimModule(Unpickler))


class _PickleShimModule:
    """Minimal pickle-module adapter exposing a custom Unpickler to torch.load."""

    __name__ = "sequoia_pickle_shim"

    def __init__(self, unpickler):
        self.Unpickler = unpickler
        self.load = pickle.load
        self.loads = pickle.loads


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pt`` state dict OR whole-module pickle -> numpy state dict."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        except (ModuleNotFoundError, AttributeError):
            obj = _shimmed_torch_load(path)
    return _to_numpy_sd(obj)


def save_torch_state_dict(sd: dict[str, np.ndarray], path: str) -> None:
    """Write a torch-loadable ``.pt`` state dict (the reference's on-disk
    checkpoint contract)."""
    import torch
    from collections import OrderedDict

    od = OrderedDict((k, torch.from_numpy(np.array(v, copy=True)))
                     for k, v in sd.items())
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(od, path)


def load_hf_vis_state_dict(repo_or_path: str) -> dict[str, np.ndarray]:
    """State dict from a PyTorchModelHubMixin layout: a local directory (or
    downloaded snapshot) with ``model.safetensors`` or ``pytorch_model.bin``."""
    path = repo_or_path
    if not os.path.isdir(path):
        from huggingface_hub import snapshot_download

        path = snapshot_download(repo_or_path)
    st = os.path.join(path, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return dict(load_file(st))
    bin_ = os.path.join(path, "pytorch_model.bin")
    if not os.path.exists(bin_):
        raise FileNotFoundError(
            f"{path} has neither model.safetensors nor pytorch_model.bin "
            f"(sharded checkpoints are not supported)")
    return load_torch_checkpoint(bin_)


def _write_hf_dir(out_dir: str, config: dict, sd) -> None:
    """PyTorchModelHubMixin directory layout: ``config.json`` (the model's
    ctor kwargs) + ``model.safetensors`` (``pytorch_model.bin`` when
    safetensors is unavailable)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    try:
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  os.path.join(out_dir, "model.safetensors"))
    except ImportError:
        save_torch_state_dict(sd, os.path.join(out_dir, "pytorch_model.bin"))


def save_hf_vis_layout(out_dir: str, cfg, params) -> None:
    """Hub-publishable ViS directory that the reference's own
    ``ViS.from_pretrained(path)`` loads unchanged — upload it to publish
    fold weights exactly like the released
    ``gevaertlab/sequoia-{cancer}-{fold}`` checkpoints (reference
    ``tformer_lin.py:80-82``).  Config keys = the reference ViS __init__
    kwargs the mixin serializes."""
    from sequoia_tpu.models import convert

    _write_hf_dir(out_dir, {
        "num_outputs": cfg.num_outputs,
        "input_dim": cfg.input_dim,
        "depth": cfg.depth,
        "nheads": cfg.nheads,
        "dimensions_f": cfg.dim_f,
        "dimensions_s": cfg.dim_s,
        "dimensions_c": cfg.dim_c,
        "num_clusters": cfg.num_clusters,
    }, convert.vis_to_torch(cfg, params))


def save_hf_he2rna_layout(out_dir: str, cfg, params) -> None:
    """PyTorchModelHubMixin layout for HE2RNA (reference ``he2rna.py:42``
    mixes the hub mixin in too).  ``nonlin``/``bias_init`` are omitted —
    the defaults reconstruct them and the trained bias already carries any
    init."""
    from sequoia_tpu.models import convert

    _write_hf_dir(out_dir, {
        "input_dim": cfg.input_dim,
        "output_dim": cfg.output_dim,
        "layers": list(cfg.layers),
        "ks": list(cfg.ks),
        "dropout": cfg.dropout,
    }, convert.he2rna_to_torch(cfg, params))


# ---------------------------------------------------------------------------
# Full training-state checkpoint/resume (params + optimizer + loop counters)
# — an addition over the reference, which only saved best-model weights
# (SURVEY.md section 5 checkpoint/resume).
# ---------------------------------------------------------------------------

def save_train_state(path: str, params, opt_state, meta: dict) -> None:
    """Atomic save of a full training state: pytrees as npz leaves + a
    pickled blob (treedefs + the meta dict of loop counters)."""
    import jax

    leaves_p, tree_p = jax.tree_util.tree_flatten(params)
    leaves_o, tree_o = jax.tree_util.tree_flatten(opt_state)
    payload = {f"p{i}": np.asarray(x) for i, x in enumerate(leaves_p)}
    payload.update({f"o{i}": np.asarray(x) for i, x in enumerate(leaves_o)})
    blob = {
        "treedef_p": pickle.dumps(tree_p),
        "treedef_o": pickle.dumps(tree_o),
        "meta": meta,
        "n_p": len(leaves_p),
        "n_o": len(leaves_o),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"  # unique per writer: concurrent
    # savers on a shared filesystem must not interleave into one tmp
    with open(tmp, "wb") as f:
        np.savez(f, __blob__=np.frombuffer(pickle.dumps(blob), np.uint8),
                 **payload)
    os.replace(tmp, path)


def load_train_state(path: str):
    """Returns (params, opt_state, meta) saved by ``save_train_state``."""
    import jax

    with np.load(path, allow_pickle=False) as z:
        blob = pickle.loads(z["__blob__"].tobytes())
        leaves_p = [z[f"p{i}"] for i in range(blob["n_p"])]
        leaves_o = [z[f"o{i}"] for i in range(blob["n_o"])]
    params = jax.tree_util.tree_unflatten(pickle.loads(blob["treedef_p"]),
                                          leaves_p)
    opt_state = jax.tree_util.tree_unflatten(pickle.loads(blob["treedef_o"]),
                                             leaves_o)
    return params, opt_state, blob["meta"]


def save_orbax(path: str, tree) -> None:
    """Orbax StandardCheckpointer save (production path: async-capable,
    sharded-array aware — the right backend for multi-chip training states;
    the npz format above stays for small single-host states)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str, like=None):
    """Orbax load; ``like`` (a pytree of arrays/ShapeDtypeStructs) restores
    exact structure/dtypes when given."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))
