"""tools/validate_real_weights.py — the one-command real-weight gate.

Offline-driveable: hub-layout local fixtures stand in for the released
artifacts (reference ``tformer_lin.py:80``, ``README.md:84-143``); the
network path is exercised as skip-clean behavior (exit 0 + a "pending
network" section in PARITY_NOTES).
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.dirname(__file__))

from sequoia_tpu.models import convert, vis  # noqa: E402

import validate_real_weights as vrw  # noqa: E402


def _vis_fixture(hub, name="sequoia-test-0"):
    cfg = vis.ViSConfig(num_outputs=6, input_dim=32, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=5)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    sd = convert.vis_to_torch(cfg, params)
    d = hub / name
    d.mkdir(parents=True)
    torch.save({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
               d / "pytorch_model.bin")
    (d / "config.json").write_text(json.dumps(
        {"num_outputs": cfg.num_outputs, "input_dim": cfg.input_dim}))


def test_offline_fixture_validation_passes(tmp_path, capsys):
    from torch_goldens import resnet50_sd

    hub = tmp_path / "hub"
    _vis_fixture(hub)
    torch.save(resnet50_sd(torch.Generator().manual_seed(0)),
               hub / "resnet50.pth")
    notes = tmp_path / "NOTES.md"
    rc = vrw.main(["--cancers", "test", "--folds", "0",
                   "--local-hub", str(hub), "--skip-uni",
                   "--notes", str(notes)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["validated"] == 2 and out["passed"] == 2
    assert out["pending_network"] == 0
    text = notes.read_text()
    assert "gevaertlab/sequoia-test-0" in text and "PASS" in text
    assert "Pending network" not in text


def test_offline_converter_matrix_exhaustive(tmp_path, capsys):
    """Every converter direction the gate can exercise offline (VERDICT r4
    item 3): vis hub-layout, vit state dict, he2rna state dict AND the
    reference's whole-module pickle (he2rna.py:301), resnet50 zoo state
    dict, UNI timm state dict — all against float64 torch oracles."""
    import sys as _sys
    import types

    import torch.nn as nn

    from sequoia_tpu.models import convert as cvt
    from sequoia_tpu.models import he2rna, vit
    from torch_goldens import resnet50_sd, uni_sd

    hub = tmp_path / "hub"
    _vis_fixture(hub)
    torch.save(resnet50_sd(torch.Generator().manual_seed(0)),
               hub / "resnet50.pth")
    uni_dir = hub / "uni"
    uni_dir.mkdir(parents=True)
    torch.save(uni_sd(torch.Generator().manual_seed(1)),
               uni_dir / "pytorch_model.bin")
    # fused-qkv state dicts don't record heads; small fixtures need the
    # sidecar (the real 1024-wide UNI infers heads=16 without it)
    (uni_dir / "config.json").write_text(json.dumps({"num_heads": 4}))

    # vit state dict (dim_head=64, the torch default the shape-inference
    # rule assumes — a fused-qkv state dict does not record the head count)
    vcfg = vit.ViTConfig(num_outputs=6, dim=64, depth=1, heads=2, dim_head=64,
                         mlp_dim=16, num_clusters=5)
    vsd = cvt.vit_to_torch(vcfg, vit.init(vcfg, jax.random.PRNGKey(1)))
    torch.save({k: torch.as_tensor(np.asarray(v)) for k, v in vsd.items()},
               hub / "vit-test.pt")

    # he2rna: plain state dict + whole-module pickle of the SAME weights
    hcfg = he2rna.HE2RNAConfig(input_dim=16, output_dim=6, layers=(8, 8),
                               ks=(1, 2, 5))
    hsd = cvt.he2rna_to_torch(hcfg, he2rna.init(hcfg, jax.random.PRNGKey(2)))
    hsd_t = {k: torch.as_tensor(np.asarray(v)) for k, v in hsd.items()}
    torch.save(hsd_t, hub / "he2rna-test.pt")

    mod = types.ModuleType("he2rna_ref_module")

    class HE2RNA(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Conv1d(16, 8, 1)
            self.conv1 = nn.Conv1d(8, 8, 1)
            self.conv2 = nn.Conv1d(8, 6, 1)

    HE2RNA.__module__ = "he2rna_ref_module"
    HE2RNA.__qualname__ = "HE2RNA"
    mod.HE2RNA = HE2RNA
    _sys.modules["he2rna_ref_module"] = mod
    try:
        m = HE2RNA()
        m.load_state_dict(hsd_t)
        torch.save(m, hub / "he2rna-module.pt")

        notes = tmp_path / "NOTES.md"
        rc = vrw.main(["--cancers", "test", "--folds", "0",
                       "--local-hub", str(hub), "--notes", str(notes)])
    finally:
        del _sys.modules["he2rna_ref_module"]
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # vis + resnet + uni + vit + he2rna-sd + he2rna-module = 6
    assert out["validated"] == 6 and out["passed"] == 6, out
    assert out["pending_network"] == 0
    text = notes.read_text()
    for frag in ("vit-test.pt", "he2rna-test.pt", "he2rna-module.pt"):
        assert frag in text, frag


def test_skip_clean_when_network_unreachable(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")  # hub calls fail immediately
    monkeypatch.setattr(vrw, "_resolve_remote", lambda *a, **k: None)
    notes = tmp_path / "NOTES.md"
    rc = vrw.main(["--cancers", "brca", "--folds", "0",
                   "--notes", str(notes)])
    assert rc == 0  # nothing reachable => skip-clean
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["validated"] == 0 and out["pending_network"] == 3
    text = notes.read_text()
    assert "Pending network" in text
    assert "gevaertlab/sequoia-brca-0 (vis)" in text
    assert "MahmoodLab/UNI (uni)" in text


def test_notes_section_is_replaced_not_duplicated(tmp_path):
    notes = tmp_path / "NOTES.md"
    notes.write_text("# Parity notes\n\nhand-written content\n")
    vrw.write_notes(str(notes), {}, ["a (vis)"])
    vrw.write_notes(str(notes), {"x": {"max_abs": 1e-6, "max_rel": 1e-6,
                                       "corr": 1.0, "pass": True}}, [])
    text = notes.read_text()
    assert text.count(vrw.NOTES_BEGIN) == 1  # replaced in place
    assert "hand-written content" in text   # surrounding text preserved
    assert "| x |" in text and "a (vis)" not in text


def test_reached_artifact_failing_parity_returns_nonzero(tmp_path,
                                                         monkeypatch):
    """A REACHED artifact that fails parity is a real failure (exit 1 +
    FAIL row), not skip-clean."""
    hub = tmp_path / "hub"
    _vis_fixture(hub)

    def bad_check(snapshot, rng):
        return {"max_abs": 0.5, "max_rel": 1.0, "corr": 0.2, "pass": False}

    monkeypatch.setattr(vrw, "check_vis", bad_check)
    notes = tmp_path / "NOTES.md"
    rc = vrw.main(["--cancers", "test", "--folds", "0",
                   "--local-hub", str(hub), "--skip-uni", "--skip-resnet",
                   "--notes", str(notes)])
    assert rc == 1
    assert "FAIL" in notes.read_text()


def test_converter_drift_is_caught(tmp_path):
    """The oracle is independent of the converter: a corrupted CONVERSION
    (not a corrupted artifact, which would hit both sides) must show up as
    a parity delta."""
    hub = tmp_path / "hub"
    _vis_fixture(hub)
    from sequoia_tpu.models import convert as conv_mod

    real = conv_mod.vis_from_torch

    def drifted(sd, cfg=None):
        cfg, params = real(sd, cfg)
        params = dict(params)
        params["head_b"] = params["head_b"] + 0.25
        return cfg, params

    try:  # the tool resolves convert.vis_from_torch at call time
        conv_mod.vis_from_torch = drifted
        row = vrw.check_vis(str(hub / "sequoia-test-0"),
                            np.random.default_rng(0))
    finally:
        conv_mod.vis_from_torch = real
    assert not row["pass"] and row["max_abs"] >= 0.2


def test_dry_run_lists_plan(capsys):
    rc = vrw.main(["--cancers", "brca,gbm", "--folds", "0,1", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("would validate vis") == 4
    assert "resnet50" in out and "MahmoodLab/UNI" in out
