"""Import harness + CV driver for the reference implementation.

Used ONLY by the offline parity gate (``tests/test_reference_parity.py``):
imports the reference's *actual* PyTorch model classes and train/eval loops
from ``/root/reference/src`` so our pipeline's outputs can be diffed against
code we did not write.  The shipped CLI layers there are broken
(``main.py`` missing imports / syntax errors — SURVEY.md section 7.5), but the
model classes and the ``train``/``evaluate`` functions are importable and
correct; this module drives them directly, reproducing ``main.py``'s fold
loop (reference ``src/main.py:96-219``) with the same deterministic batch
stream as ``sequoia_tpu.train.cv.run_cross_validation``.

Nothing from here ships in ``sequoia_tpu``; no reference code is copied —
it is imported from its own tree and executed as the parity oracle.
"""

from __future__ import annotations

import importlib
import os
import pickle
import sys
import types

import numpy as np

REFERENCE_ROOT = os.environ.get("SEQUOIA_REFERENCE_ROOT", "/root/reference")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    return os.path.exists(os.path.join(root, "src", "tformer_lin.py"))


def load_reference(root: str = REFERENCE_ROOT):
    """Import the reference's model/loop modules (stubbing wandb, which the
    reference imports at module scope but only uses when logging is on)."""
    if "wandb" not in sys.modules:
        stub = types.ModuleType("wandb")
        stub.log = lambda *a, **k: None
        stub.init = lambda *a, **k: types.SimpleNamespace(
            log=stub.log, finish=lambda: None)
        sys.modules["wandb"] = stub
    if root not in sys.path:
        sys.path.insert(0, root)
    return types.SimpleNamespace(
        tformer_lin=importlib.import_module("src.tformer_lin"),
        vit=importlib.import_module("src.vit"),
        he2rna=importlib.import_module("src.he2rna"),
        read_data=importlib.import_module("src.read_data"),
        utils=importlib.import_module("src.utils"),
    )


def load_reference_visualize(root: str = REFERENCE_ROOT):
    """Import the reference's ``spatial_vis/visualize.py`` module so the
    parity gate can drive its ACTUAL ``sliding_window_method``
    (``visualize.py:35-102``).

    The module-top imports pull ``openslide``/``timm``/``torchvision`` —
    none needed by the window function itself (it touches only the
    module-global ``slide``/``transforms_``, which the caller sets) — so
    they are stubbed in ``sys.modules`` exactly like ``wandb`` above.
    """
    load_reference(root)  # puts <root> on sys.path + stubs wandb
    src = os.path.join(root, "src")
    if src not in sys.path:  # visualize.py does `from tformer_lin import ViS`
        sys.path.insert(0, src)
    stubbed = []
    for name in ("openslide", "timm"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        stubbed += ["torchvision", "torchvision.transforms"]
    import importlib.util

    try:
        spec = importlib.util.spec_from_file_location(
            "reference_visualize", os.path.join(root, "spatial_vis",
                                                "visualize.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        # the loaded module keeps its own references; a stub left in
        # sys.modules would later shadow real backends for unrelated code
        # (open_slide's backend probe found an empty `openslide` and died)
        for name in stubbed:
            sys.modules.pop(name, None)
    return mod


def load_reference_patch_gen(root: str = REFERENCE_ROOT, *,
                             skimage_funcs: dict, open_slide_factory):
    """Import the reference's ``pre_processing/patch_gen_hdf5.py`` so the
    parity gate can drive its ACTUAL ``extract_patches``/``get_mask``
    (``patch_gen_hdf5.py:25-133``).

    skimage is absent in this sandbox and openslide has no SVS data, so
    both are stubbed: ``skimage_funcs`` must supply INDEPENDENT textbook
    implementations written in the test (``rgb2hsv``, ``threshold_otsu``,
    ``is_low_contrast`` — the same third-implementation pattern the
    evaluate_model gate uses for statsmodels' BH), and
    ``open_slide_factory(path)`` returns a PIL-returning slide object for
    the test's synthetic pyramid.  Stubs are popped after import (the
    loaded module keeps its references)."""
    stubbed = []

    def _stub(name: str, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        stubbed.append(name)
        return mod

    def _unused(name):
        def fn(*a, **k):
            raise AssertionError(f"reference called stub skimage.{name}")
        return fn

    for name in ("skimage", "openslide"):
        if name in sys.modules:
            # silently running the reference against a REAL (or leaked)
            # module would void the gate's third-implementation premise
            raise RuntimeError(
                f"{name!r} already in sys.modules — the patch_gen parity "
                f"gate requires the caller-supplied stubs to be the ones "
                f"actually used; pop it (or fix the leak) first")
    sk = _stub("skimage")
    sk.color = _stub("skimage.color", rgb2hsv=skimage_funcs["rgb2hsv"])
    sk.filters = _stub("skimage.filters",
                       threshold_otsu=skimage_funcs["threshold_otsu"])
    sk.io = _stub("skimage.io", imsave=_unused("imsave"),
                  imread=_unused("imread"))
    sk.exposure = _stub("skimage.exposure")
    sk.exposure.exposure = _stub(
        "skimage.exposure.exposure",
        is_low_contrast=skimage_funcs["is_low_contrast"])
    sk.transform = _stub("skimage.transform", resize=_unused("resize"))
    _stub("openslide", OpenSlide=open_slide_factory)
    import importlib.util

    try:
        spec = importlib.util.spec_from_file_location(
            "reference_patch_gen",
            os.path.join(root, "pre_processing", "patch_gen_hdf5.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubbed:  # see load_reference_visualize
            sys.modules.pop(name, None)
    return mod


def load_reference_get_emd(root: str = REFERENCE_ROOT):
    """Import the reference's ``spatial_vis/get_emd.py`` (EMD comparator).
    Its module-top ``scanpy``/``ot`` imports are data-loading only — the
    comparator math (``img_to_sig``/``calculate_emd``/``median_filter``/
    ``get_average``) needs neither — so both are stubbed like ``wandb``."""
    stubbed = []
    for name in ("scanpy", "ot"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    import importlib.util

    try:
        spec = importlib.util.spec_from_file_location(
            "reference_get_emd",
            os.path.join(root, "spatial_vis", "get_emd.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubbed:  # see load_reference_visualize
            sys.modules.pop(name, None)
    return mod


class TorchStream:
    """Adapter presenting a sequoia_tpu ``BatchLoader`` to the reference's
    torch loops: yields ``(features, rna, wsi, project)`` with padded rows
    stripped, so both frameworks consume the *identical* batch sequence
    (``BatchLoader`` reshuffles deterministically per epoch on both sides)."""

    def __init__(self, loader):
        self.loader = loader

    def __iter__(self):
        import torch

        for b in self.loader:
            if b.n_valid == 0:
                continue
            n = b.n_valid
            yield (torch.from_numpy(np.ascontiguousarray(b.features[:n])),
                   torch.from_numpy(np.ascontiguousarray(b.rna[:n])),
                   list(b.wsi), list(b.project))


def _load_our_params(model, sd: dict) -> None:
    """Load a converter-produced {torch_name: ndarray} dict into a reference
    torch module (identical initialization on both sides of the gate)."""
    import torch

    model.load_state_dict({k: torch.as_tensor(np.array(v, copy=True))
                           for k, v in sd.items()})


def build_reference_model(ref, model_type: str, num_outputs: int,
                          feature_dim: int, depth: int, num_heads: int,
                          num_clusters: int = 100):
    """The reference ``main.py:160-168`` model factory, on CPU."""
    if model_type == "vit":
        return ref.vit.ViT(num_outputs=num_outputs, dim=feature_dim,
                           depth=depth, heads=num_heads, mlp_dim=2048,
                           dim_head=64, num_clusters=num_clusters,
                           device="cpu")
    if model_type == "vis":
        return ref.tformer_lin.ViS(num_outputs=num_outputs,
                                   input_dim=feature_dim, depth=depth,
                                   nheads=num_heads, dimensions_f=64,
                                   dimensions_c=64, dimensions_s=64,
                                   num_clusters=num_clusters, device="cpu")
    raise ValueError(model_type)


def run_reference_cross_validation(
        df, feature_path: str, save_dir: str, *, model_type: str = "vis",
        depth: int = 6, num_heads: int = 16, k: int = 5, batch_size: int = 16,
        lr: float = 1e-3, num_epochs: int = 200, seed: int = 99,
        save_on: str = "loss", stop_on: str = "loss",
        checkpoint_path: str | None = None, change_num_genes: int = 0,
        verbose: bool = False) -> dict:
    """The reference ``src/main.py`` fold loop executed with the REFERENCE's
    own classes and loops (``train``/``evaluate`` from ``src/vit.py``,
    ``ViS``/``ViT`` from their modules, torch ``AdamW(lr, wd=0)``), on the
    same splits, batch stream, and initial weights as
    ``sequoia_tpu.train.cv.run_cross_validation(seed=seed)``.

    Like the reference, the FINAL model (not the saved best) produces
    ``test_results.pkl`` (``main.py:193``), and the random-null model is a
    fresh initialization (``main.py:196-204``) — here materialized from the
    same PRNG keys as our CV so both pipelines' nulls agree too.
    """
    import jax
    import torch

    from sequoia_tpu.data import dataset as ds
    from sequoia_tpu.data import splits as sp
    from sequoia_tpu.train import cv as our_cv

    ref = load_reference()
    torch.manual_seed(0)
    os.makedirs(save_dir, exist_ok=True)

    key = jax.random.PRNGKey(seed)
    train_idxs, val_idxs, test_idxs = sp.patient_kfold(
        df["patient_id"].to_numpy(), n_splits=k)

    results: dict = {}
    for i, (train_idx, val_idx, test_idx) in enumerate(
            zip(train_idxs, val_idxs, test_idxs)):
        train_ds = ds.FeatureDataset(df.iloc[train_idx], feature_path)
        val_ds = ds.FeatureDataset(df.iloc[val_idx], feature_path)
        test_ds = ds.FeatureDataset(df.iloc[test_idx], feature_path)
        num_outputs, feature_dim = train_ds.num_genes, train_ds.feature_dim
        num_clusters = getattr(train_ds, "num_tokens", 100)

        # identical key schedule to our run_cross_validation
        key, kinit, krand, khead = jax.random.split(key, 4)
        if checkpoint_path and change_num_genes:
            # GTEx->TCGA head swap, reference main.py:138-157: build at the
            # pretraining width, load the checkpoint, replace linear_head.
            import torch.nn as nn

            from sequoia_tpu.models import vis as vis_mod
            from sequoia_tpu.models import vit as vit_mod
            from sequoia_tpu.train import checkpoint as ckpt

            cfg, params, _apply, to_torch, from_torch = our_cv.build_model(
                model_type, change_num_genes, feature_dim, kinit, depth,
                num_heads, num_clusters)
            sd = ckpt.load_torch_checkpoint(checkpoint_path)
            cfg, params = from_torch(sd, cfg)
            swap = (vis_mod.replace_head if model_type == "vis"
                    else vit_mod.replace_head)
            cfg, params = swap(cfg, params, num_outputs, khead)

            model = build_reference_model(ref, model_type, change_num_genes,
                                          feature_dim, depth, num_heads,
                                          num_clusters)
            _load_our_params(model, sd)
            model.linear_head = nn.Sequential(nn.LayerNorm(feature_dim),
                                              nn.Linear(feature_dim,
                                                        num_outputs))
            # overwrite the torch-random fresh head with OUR khead init so
            # both trajectories start from identical weights
            _load_our_params(model, to_torch(cfg, params))
        else:
            cfg, params, _apply, to_torch, _ = our_cv.build_model(
                model_type, num_outputs, feature_dim, kinit, depth, num_heads,
                num_clusters)

            model = build_reference_model(ref, model_type, num_outputs,
                                          feature_dim, depth, num_heads,
                                          num_clusters)
            _load_our_params(model, to_torch(cfg, params))

        optimizer = torch.optim.AdamW(list(model.parameters()), lr=lr,
                                      amsgrad=False, weight_decay=0.0)
        loaders = {
            "train": TorchStream(ds.BatchLoader(train_ds, batch_size,
                                                shuffle=True, seed=seed)),
            "val": TorchStream(ds.BatchLoader(val_ds, batch_size)),
        }
        model = ref.vit.train(model, loaders, optimizer,
                              num_epochs=num_epochs, save_dir=save_dir,
                              split=i, save_on=save_on, stop_on=stop_on,
                              delta=0.5, verbose=verbose)

        test_loader = TorchStream(ds.BatchLoader(test_ds, batch_size))
        preds, real, wsis, projs = ref.vit.evaluate(model, test_loader,
                                                    verbose=verbose)

        cfg_r, params_r, _a, to_torch_r, _ = our_cv.build_model(
            model_type, num_outputs, feature_dim, krand, depth, num_heads,
            num_clusters)
        random_model = build_reference_model(ref, model_type, num_outputs,
                                             feature_dim, depth, num_heads,
                                             num_clusters)
        _load_our_params(random_model, to_torch_r(cfg_r, params_r))
        random_preds, _, _, _ = ref.vit.evaluate(random_model, test_loader,
                                                 verbose=verbose)

        results[f"split_{i}"] = {
            "real": real, "preds": preds, "random": random_preds,
            "wsi_file_name": wsis, "tcga_project": projs,
        }

    results["genes"] = [c[4:] for c in df.columns if "rna_" in c]
    with open(os.path.join(save_dir, "test_results.pkl"), "wb") as f:
        pickle.dump(results, f, protocol=pickle.HIGHEST_PROTOCOL)
    return results
