"""One-command validation against the REAL released weights.

The standing network-gated gate (VERDICT rounds 1-3): the rebuild's central
interop claim is that the reference's released artifacts load directly —

* the HuggingFace fold checkpoints ``gevaertlab/sequoia-{cancer}-{fold}``
  (reference ``src/tformer_lin.py:80``, ``README.md:137-142``),
* the torchvision ImageNet resnet50 zoo weights (``src/resnet.py:13,376-379``),
* the MahmoodLab UNI ViT-L ``pytorch_model.bin``
  (``pre_processing/compute_features_hdf5.py:62-68``).

This tool pulls whatever it can reach, converts each artifact with the
first-party converters, runs the SAME input through the torch-functional
oracle and our JAX forward, and records the deltas into
``docs/PARITY_NOTES.md``.  With no network it is skip-clean (exit 0 with a
"pending network" note); point ``--local-hub`` at a directory of hub-layout
snapshots to run fully offline (how the tests drive it).

    python tools/validate_real_weights.py                      # try network
    python tools/validate_real_weights.py --local-hub /ckpts   # offline dirs
    python tools/validate_real_weights.py --dry-run            # plan only

Layout expected under --local-hub (any subset):
    sequoia-{cancer}-{fold}/ (config.json + pytorch_model.bin|model.safetensors)
    resnet50.pth             (torchvision state dict)
    uni/pytorch_model.bin    (timm ViT-L/16 state dict)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import date

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))  # torch-functional oracles

DEFAULT_CANCERS = ("brca", "luad", "lusc", "kirc", "coad", "gbm", "prad",
                   "thca", "skcm", "stad", "paad", "ucec", "hnsc", "lihc",
                   "lgg", "kirp")
NOTES_BEGIN = "<!-- validate_real_weights:begin -->"
NOTES_END = "<!-- validate_real_weights:end -->"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# artifact resolution

def hub_snapshot(repo_id: str, cache: str | None):
    """Download (or reuse) one hub snapshot; None when unreachable."""
    try:
        from huggingface_hub import snapshot_download
    except Exception as e:  # noqa: BLE001
        log(f"huggingface_hub unavailable ({e}); skipping {repo_id}")
        return None
    try:
        return snapshot_download(repo_id, cache_dir=cache,
                                 etag_timeout=10)
    except Exception as e:  # noqa: BLE001
        log(f"cannot reach {repo_id}: {type(e).__name__}: {e}")
        return None


def load_state_dict(path_or_dir: str):
    """torch state dict from a .pt/.pth/.bin file or a hub snapshot dir."""
    import torch

    p = path_or_dir
    if os.path.isdir(p):
        for name in ("model.safetensors", "pytorch_model.bin"):
            c = os.path.join(p, name)
            if os.path.exists(c):
                p = c
                break
        else:
            raise FileNotFoundError(f"no weights file in {path_or_dir}")
    if p.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(p)
    else:
        try:
            # state-dict artifacts (the common case) load with the safe
            # unpickler — no arbitrary code execution from a compromised
            # upstream repo
            sd = torch.load(p, map_location="cpu", weights_only=True)
        except Exception:  # noqa: BLE001 — whole-module pickle layout
            log(f"WARNING: {p} is not a plain state dict; falling back to "
                "weights_only=False (executes pickle code — only do this "
                "for the known HE2RNA whole-module layout, he2rna.py:301)")
            sd = torch.load(p, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):  # whole-module pickle
            sd = sd.state_dict()
    return {k: v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# per-family checks: torch-functional oracle vs our JAX forward on one input

def check_vis(snapshot: str, rng: np.random.Generator) -> dict:
    import torch

    import jax

    from sequoia_tpu.models import convert, vis
    from torch_goldens import vis_forward

    sd = load_state_dict(snapshot)
    cfg, params = convert.vis_from_torch(sd)
    x = rng.normal(size=(2, cfg.num_clusters, cfg.input_dim)).astype(
        np.float32)
    ours = np.asarray(jax.jit(lambda p, v: vis.apply(cfg, p, v))(params,
                                                                 x))
    sd_t = {k: torch.as_tensor(np.asarray(v)).double() for k, v in sd.items()}
    theirs = vis_forward(sd_t, torch.as_tensor(x).double(), depth=cfg.depth,
                         H=cfg.nheads, df=cfg.dim_f,
                         ds=cfg.dim_s).detach().numpy()
    return _delta_row(ours, theirs, extra={"genes": cfg.num_outputs,
                                           "input_dim": cfg.input_dim})


def check_vit(path: str, rng: np.random.Generator) -> dict:
    """ViT converter direction (no released artifacts — local fixtures
    only; completes the converter matrix, VERDICT r4 item 3)."""
    import torch

    import jax

    from sequoia_tpu.models import convert, vit
    from torch_goldens import vit_forward

    sd = load_state_dict(path)
    cfg, params = convert.vit_from_torch(sd)
    x = rng.normal(size=(2, cfg.num_clusters, cfg.dim)).astype(np.float32)
    ours = np.asarray(jax.jit(lambda p, v: vit.apply(cfg, p, v))(params, x))
    sd_t = {k: torch.as_tensor(np.asarray(v)).double() for k, v in sd.items()}
    theirs = vit_forward(sd_t, torch.as_tensor(x).double(), depth=cfg.depth,
                         H=cfg.heads, dh=cfg.dim_head).detach().numpy()
    return _delta_row(ours, theirs, extra={"genes": cfg.num_outputs,
                                           "dim": cfg.dim})


def check_he2rna(path: str, rng: np.random.Generator) -> dict:
    """HE2RNA converter direction — exercises BOTH artifact layouts (plain
    state dict and the reference's whole-module pickle, ``he2rna.py:301``,
    which load_state_dict unwraps) against the eval-mode k-sweep forward."""
    import torch

    import jax

    from sequoia_tpu.models import convert, he2rna
    from torch_goldens import he2rna_eval_forward

    sd = load_state_dict(path)
    cfg, params = convert.he2rna_from_torch(sd)
    x = rng.normal(size=(2, 100, cfg.input_dim)).astype(np.float32)
    ours = np.asarray(jax.jit(
        lambda p, v: he2rna.apply(cfg, p, v, train=False))(params, x))
    sd_t = {k: torch.as_tensor(np.asarray(v)).double() for k, v in sd.items()}
    theirs = he2rna_eval_forward(
        sd_t, torch.as_tensor(x).double(),
        n_layers=len(cfg.layers) + 1, ks=cfg.ks).detach().numpy()
    return _delta_row(ours, theirs, extra={"genes": cfg.output_dim,
                                           "ks": list(cfg.ks)})


def check_resnet50(path: str, rng: np.random.Generator) -> dict:
    import torch

    import jax

    from sequoia_tpu.models import resnet
    from torch_goldens import resnet50_forward_extract

    sd = load_state_dict(path)
    cfg, params = resnet.resnet_from_torch(sd)
    u8 = rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8)
    ours = np.asarray(jax.jit(
        lambda p, v: resnet.extract_from_uint8(cfg, p, v))(params, u8))
    # the reference normalizes with the ImageNet transform before
    # forward_extract (compute_features_hdf5.py:50-56)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    x = (u8.astype(np.float32) / 255.0 - mean) / std
    sd_t = {k: torch.as_tensor(np.asarray(v)).double() for k, v in sd.items()}
    theirs = resnet50_forward_extract(
        sd_t, torch.as_tensor(x.transpose(0, 3, 1, 2)).double()).detach().numpy()
    return _delta_row(ours, theirs, extra={"feature_dim": ours.shape[-1]})


def check_uni(path: str, rng: np.random.Generator) -> dict:
    import torch

    import jax

    from sequoia_tpu.models import uni_vit
    from torch_goldens import uni_forward

    sd = load_state_dict(path)
    # the real UNI (dim 1024) infers heads=16; small local fixtures carry
    # a config.json sidecar (fused-qkv state dicts don't record heads)
    heads = None
    cfg_json = os.path.join(path if os.path.isdir(path)
                            else os.path.dirname(path), "config.json")
    if os.path.exists(cfg_json):
        with open(cfg_json) as f:
            meta = json.load(f)
        heads = meta.get("num_heads") or meta.get("heads")
    cfg, params = uni_vit.uni_from_torch(sd, heads=heads)
    # feed at the model's native size (224 for the real UNI) — the torch
    # oracle has no resize stage
    u8 = rng.integers(0, 256, (2, cfg.img_size, cfg.img_size, 3),
                      dtype=np.uint8)
    # the shared serving/extraction program (reference preprocessing baked in)
    ours = np.asarray(jax.jit(
        lambda p, v: uni_vit.extract_from_uint8(cfg, p, v))(params, u8))
    sd_t = {k: torch.as_tensor(np.asarray(v)).double() for k, v in sd.items()}
    theirs = uni_forward(sd_t, torch.as_tensor(
        _uni_pre_nchw(u8)).double(), depth=cfg.depth,
        heads=cfg.heads).detach().numpy()
    return _delta_row(ours, theirs, extra={"feature_dim": ours.shape[-1]})


def _uni_pre_nchw(u8: np.ndarray) -> np.ndarray:
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    x = (u8.astype(np.float32) / 255.0 - mean) / std
    return x.transpose(0, 3, 1, 2)


def _delta_row(ours: np.ndarray, theirs: np.ndarray, extra: dict) -> dict:
    d = np.abs(ours - theirs)
    denom = np.maximum(np.abs(theirs), 1e-6)
    row = {"max_abs": float(d.max()),
           "max_rel": float((d / denom).max()),
           "corr": float(np.corrcoef(ours.ravel(), theirs.ravel())[0, 1])}
    row.update(extra)
    row["pass"] = bool(row["max_abs"] <= 1e-2 and row["corr"] > 0.99999)
    return row


# ---------------------------------------------------------------------------
# PARITY_NOTES.md section

def write_notes(notes_path: str, rows: dict[str, dict], pending: list[str]):
    today = date.today().isoformat()
    lines = [NOTES_BEGIN,
             "## Real released-weight validation "
             f"(tools/validate_real_weights.py, last run {today})", ""]
    if rows:
        lines += ["| artifact | max abs delta | max rel delta | corr | pass |",
                  "|---|---|---|---|---|"]
        for name, r in sorted(rows.items()):
            lines.append(f"| {name} | {r['max_abs']:.2e} | "
                         f"{r['max_rel']:.2e} | {r['corr']:.6f} | "
                         f"{'PASS' if r['pass'] else 'FAIL'} |")
        lines.append("")
    if pending:
        lines += ["**Pending network** — these artifacts were unreachable "
                  "and remain unvalidated; rerun when network exists:", ""]
        lines += [f"- {p}" for p in pending]
        lines.append("")
    lines.append(NOTES_END)
    block = "\n".join(lines)

    text = ""
    if os.path.exists(notes_path):
        with open(notes_path) as f:
            text = f.read()
    if NOTES_BEGIN in text and NOTES_END in text:
        pre = text[: text.index(NOTES_BEGIN)]
        post = text[text.index(NOTES_END) + len(NOTES_END):]
        text = pre + block + post
    else:
        text = text.rstrip() + ("\n\n" if text.strip() else "") + block + "\n"
    with open(notes_path, "w") as f:
        f.write(text)


# ---------------------------------------------------------------------------

def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="validate converters against the real released weights")
    ap.add_argument("--cancers", default="brca",
                    help="comma list of sequoia-{cancer}-{fold} cohorts "
                         f"(released: {','.join(DEFAULT_CANCERS)})")
    ap.add_argument("--folds", default="0",
                    help="comma list of folds per cancer (released: 0-4)")
    ap.add_argument("--local-hub", default=None,
                    help="directory of offline snapshots (see module doc); "
                         "checked before any network attempt")
    ap.add_argument("--cache", default=None, help="hub download cache dir")
    ap.add_argument("--notes", default=os.path.join(_REPO, "docs",
                                                    "PARITY_NOTES.md"))
    ap.add_argument("--skip-uni", action="store_true")
    ap.add_argument("--skip-resnet", action="store_true")
    ap.add_argument("--dry-run", action="store_true",
                    help="list the artifact plan without loading anything")
    args = ap.parse_args(argv)

    plan: list[tuple[str, str, object]] = []  # (name, kind, resolver)
    for cancer in args.cancers.split(","):
        for fold in args.folds.split(","):
            name = f"gevaertlab/sequoia-{cancer.strip()}-{fold.strip()}"
            plan.append((name, "vis", None))
    if not args.skip_resnet:
        plan.append(("torchvision/resnet50-IMAGENET1K_V1", "resnet50", None))
    if not args.skip_uni:
        plan.append(("MahmoodLab/UNI", "uni", None))
    # converter-matrix fixtures (vit/he2rna have NO released artifacts;
    # validated whenever the local hub carries a fixture — the offline
    # matrix test fabricates all of them, incl. the whole-module pickle)
    if args.local_hub:
        for fname, kind in (("vit-test.pt", "vit"),
                            ("he2rna-test.pt", "he2rna"),
                            ("he2rna-module.pt", "he2rna")):
            p = os.path.join(args.local_hub, fname)
            if os.path.exists(p):
                plan.append((f"local/{fname}", kind, p))

    if args.dry_run:
        for name, kind, _ in plan:
            print(f"would validate {kind}: {name}")
        return 0

    rng = np.random.default_rng(0)
    rows: dict[str, dict] = {}
    pending: list[str] = []
    for name, kind, src in plan:
        if src is None:
            src = (_resolve_local(args.local_hub, name, kind)
                   or _resolve_remote(name, kind, args.cache))
        if src is None:
            pending.append(f"{name} ({kind})")
            continue
        log(f"validating {kind}: {name} <- {src}")
        try:
            check = {"vis": check_vis, "resnet50": check_resnet50,
                     "uni": check_uni, "vit": check_vit,
                     "he2rna": check_he2rna}[kind]
            rows[name] = check(src, rng)
            log(f"  {rows[name]}")
        except Exception as e:  # noqa: BLE001 — one bad artifact must not
            rows[name] = {"max_abs": float("nan"), "max_rel": float("nan"),
                          "corr": float("nan"), "pass": False,
                          "error": f"{type(e).__name__}: {e}"}
            log(f"  FAILED: {rows[name]['error']}")

    write_notes(args.notes, rows, pending)
    n_pass = sum(1 for r in rows.values() if r["pass"])
    print(json.dumps({"validated": len(rows), "passed": n_pass,
                      "pending_network": len(pending),
                      "notes": args.notes}))
    if rows and n_pass < len(rows):
        return 1  # a REACHED artifact failing parity is a real failure
    return 0     # nothing reachable = skip-clean


def _resolve_local(root: str | None, name: str, kind: str) -> str | None:
    if not root:
        return None
    cand = {
        "vis": [os.path.join(root, name.split("/")[-1])],
        "resnet50": [os.path.join(root, "resnet50.pth"),
                     os.path.join(root, "resnet50.pt")],
        "uni": [os.path.join(root, "uni", "pytorch_model.bin"),
                os.path.join(root, "uni")],
    }[kind]
    for c in cand:
        if os.path.exists(c):
            return c
    return None


def _resolve_remote(name: str, kind: str, cache: str | None) -> str | None:
    if kind == "vis":
        return hub_snapshot(name, cache)
    if kind == "uni":
        return hub_snapshot("MahmoodLab/UNI", cache)
    if kind == "resnet50":
        try:
            import torch

            url = ("https://download.pytorch.org/models/"
                   "resnet50-0676ba61.pth")
            sd = torch.hub.load_state_dict_from_url(url, progress=False)
            path = os.path.join(cache or "/tmp", "resnet50.pth")
            torch.save(sd, path)
            return path
        except Exception as e:  # noqa: BLE001
            log(f"cannot reach torchvision zoo: {type(e).__name__}: {e}")
            return None
    return None


if __name__ == "__main__":
    raise SystemExit(main())
