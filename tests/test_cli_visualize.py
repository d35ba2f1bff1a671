"""cli.visualize end-to-end on a synthetic TCGA-layout workspace."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

import jax

from sequoia_tpu.models import convert, vis
from sequoia_tpu.pipeline import patch_gen
from sequoia_tpu.train import checkpoint
from tests.test_pipeline_e2e import synthetic_wsi


@pytest.mark.slow
def test_cli_visualize_tcga_layout(tmp_path, monkeypatch):
    from sequoia_tpu.cli import visualize as cv

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    project = "TCGA-SYN"
    wsi = "TCGA-AA-0001.svs"
    stem = wsi.replace(".svs", "")

    # slide + stage-1 mask in the reference TCGA path convention
    slide = synthetic_wsi()
    os.makedirs(f"TCGA/{project}", exist_ok=True)
    native.write_tiled_tiff(f"TCGA/{project}/{wsi}",
                            [slide.levels[0], slide.levels[1]], tile=(128, 128))
    mask, _ = patch_gen.compute_slide_mask(slide)
    os.makedirs(f"TCGA/{project}_Masks/{stem}", exist_ok=True)
    np.save(f"TCGA/{project}_Masks/{stem}/mask.npy", mask)

    # fold checkpoints + test_results.pkl with the gene list
    genes = [f"G{i}" for i in range(5)]
    ckpt_dir = "vis_resnet/syn/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = vis.ViSConfig(num_outputs=5, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    for fold in range(2):
        params = vis.init(cfg, jax.random.PRNGKey(fold))
        name = "model_best.pt" if fold == 0 else f"model_best_{fold}.pt"
        checkpoint.save_torch_state_dict(convert.vis_to_torch(cfg, params),
                                         os.path.join(ckpt_dir, name))
    with open(os.path.join(ckpt_dir, "test_results.pkl"), "wb") as f:
        pickle.dump({"genes": genes}, f)

    cv.main(["--study", "syn", "--project", project, "--gene_names", "G1,G3",
             "--wsi_file_name", wsi, "--save_folder", "maps",
             "--model_type", "vis", "--feat_type", "resnet",
             "--folds", "0,1", "--stride", "4", "--patch_size", "64",
             "--weights", "random", "--batch_size", "32"])

    out = pd.read_csv(f"visualizations/{project}/maps/{wsi}/stride-4.csv",
                      index_col=0)
    for col in ("xcoord", "ycoord", "xcoord_tf", "ycoord_tf",
                "G1_0", "G1_1", "G1", "G3_0", "G3_1", "G3"):
        assert col in out.columns, col
    assert out["G1"].notna().sum() > 5
    pd.testing.assert_series_equal(out["G1"],
                                   out[["G1_0", "G1_1"]].mean(axis=1),
                                   check_names=False)


@pytest.mark.slow
def test_cli_visualize_he2rna_model(tmp_path, monkeypatch):
    """HE2RNA spatial maps: fold ckpts named model_{i}.pt (the reference's
    whole-module convention, cli strips 'best_'), he2rna predict path."""
    from sequoia_tpu.cli import visualize as cv
    from sequoia_tpu.models import convert as cvt
    from sequoia_tpu.models import he2rna

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    project = "TCGA-SYN"
    wsi = "TCGA-AA-0002.svs"
    stem = wsi.replace(".svs", "")

    slide = synthetic_wsi()
    os.makedirs(f"TCGA/{project}", exist_ok=True)
    native.write_tiled_tiff(f"TCGA/{project}/{wsi}",
                            [slide.levels[0], slide.levels[1]], tile=(128, 128))
    mask, _ = patch_gen.compute_slide_mask(slide)
    os.makedirs(f"TCGA/{project}_Masks/{stem}", exist_ok=True)
    np.save(f"TCGA/{project}_Masks/{stem}/mask.npy", mask)

    genes = [f"G{i}" for i in range(4)]
    ckpt_dir = "he2rna_resnet/syn/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = he2rna.HE2RNAConfig(input_dim=2048, output_dim=4, layers=(8,),
                              ks=(1, 2))
    for fold in range(2):
        params = he2rna.init(cfg, jax.random.PRNGKey(fold))
        checkpoint.save_torch_state_dict(
            cvt.he2rna_to_torch(cfg, params),
            os.path.join(ckpt_dir, f"model_{fold}.pt"))
    with open(os.path.join(ckpt_dir, "test_results.pkl"), "wb") as f:
        pickle.dump({"genes": genes}, f)

    cv.main(["--study", "syn", "--project", project, "--gene_names", "G0,G2",
             "--wsi_file_name", wsi, "--save_folder", "maps",
             "--model_type", "he2rna", "--feat_type", "resnet",
             "--folds", "0,1", "--stride", "4", "--patch_size", "64",
             "--weights", "random", "--batch_size", "32"])

    out = pd.read_csv(f"visualizations/{project}/maps/{wsi}/stride-4.csv",
                      index_col=0)
    for col in ("G0_0", "G0_1", "G0", "G2_0", "G2_1", "G2"):
        assert col in out.columns, col
    assert out["G0"].notna().sum() > 5
    # NOTE: no ReLU here — the reference's spatial path calls the bare
    # model forward (visualize.py:78-83); the eval-only ReLU lives in
    # he2rna_predict, not in spatial maps
    assert np.isfinite(out["G0"].dropna()).all()


@pytest.mark.slow
def test_cli_visualize_vit_model(tmp_path, monkeypatch):
    """ViT spatial maps through the same TCGA-layout workspace."""
    from sequoia_tpu.cli import visualize as cv
    from sequoia_tpu.models import convert as cvt
    from sequoia_tpu.models import vit as vit_mod

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    project = "TCGA-SYN"
    wsi = "TCGA-AA-0003.svs"
    stem = wsi.replace(".svs", "")

    slide = synthetic_wsi()
    os.makedirs(f"TCGA/{project}", exist_ok=True)
    native.write_tiled_tiff(f"TCGA/{project}/{wsi}",
                            [slide.levels[0], slide.levels[1]], tile=(128, 128))
    mask, _ = patch_gen.compute_slide_mask(slide)
    os.makedirs(f"TCGA/{project}_Masks/{stem}", exist_ok=True)
    np.save(f"TCGA/{project}_Masks/{stem}/mask.npy", mask)

    genes = [f"G{i}" for i in range(3)]
    ckpt_dir = "vit_resnet/syn/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = vit_mod.ViTConfig(num_outputs=3, dim=2048, depth=1, heads=2,
                            dim_head=4, mlp_dim=8)
    params = vit_mod.init(cfg, jax.random.PRNGKey(0))
    checkpoint.save_torch_state_dict(cvt.vit_to_torch(cfg, params),
                                     os.path.join(ckpt_dir, "model_best_0.pt"))
    with open(os.path.join(ckpt_dir, "test_results.pkl"), "wb") as f:
        pickle.dump({"genes": genes}, f)

    cv.main(["--study", "syn", "--project", project, "--gene_names", "G1",
             "--wsi_file_name", wsi, "--save_folder", "maps",
             "--model_type", "vit", "--feat_type", "resnet",
             "--folds", "0", "--stride", "4", "--patch_size", "64",
             "--weights", "random", "--batch_size", "32"])

    out = pd.read_csv(f"visualizations/{project}/maps/{wsi}/stride-4.csv",
                      index_col=0)
    assert "G1_0" in out.columns and "G1" in out.columns
    assert np.isfinite(out["G1"].dropna()).all()
    assert out["G1"].notna().sum() > 5


@pytest.mark.slow
def test_cli_visualize_spatial_gbm_layout(tmp_path, monkeypatch):
    """spatial_GBM_pred layout (reference visualize.py:148-183): pyramid/
    dir, masks/*.npy, spot_diameter.csv-derived manual resize."""
    import json as _json

    from sequoia_tpu.cli import visualize as cv

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    wsi = "HRI_7_T.tif"

    slide = synthetic_wsi()
    os.makedirs("Spatial_GBM/pyramid", exist_ok=True)
    native.write_tiled_tiff(f"Spatial_GBM/pyramid/{wsi}",
                            [slide.levels[0], slide.levels[1]], tile=(128, 128))
    mask, _ = patch_gen.compute_slide_mask(slide)
    os.makedirs("Spatial_GBM/masks", exist_ok=True)
    np.save(f"Spatial_GBM/masks/{wsi.replace('.tif', '.npy')}", mask)
    os.makedirs("Spatial_Heiland/data/classify", exist_ok=True)
    # pixel diameter chosen so 0.5/um_px == 1.0 (no manual resize):
    # um_px = 55/diam -> diam = 110
    pd.DataFrame({"slide_id": ["7_T"], "pixel_diameter": [110.0]}).to_csv(
        "Spatial_Heiland/data/classify/spot_diameter.csv", index=False)

    genes = ["G0", "G1"]
    ckpt_dir = "vis_resnet/gbm/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = vis.ViSConfig(num_outputs=2, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    checkpoint.save_torch_state_dict(
        convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(0))),
        os.path.join(ckpt_dir, "model_best_0.pt"))
    with open(os.path.join(ckpt_dir, "test_results.pkl"), "wb") as f:
        pickle.dump({"genes": genes}, f)

    cv.main(["--study", "gbm", "--project", "spatial_GBM_pred",
             "--gene_names", "G1", "--wsi_file_name", wsi,
             "--save_folder", "maps", "--model_type", "vis",
             "--feat_type", "resnet", "--folds", "0", "--stride", "4",
             "--patch_size", "64", "--weights", "random",
             "--batch_size", "32"])

    out = pd.read_csv(f"visualizations/spatial_GBM_pred/maps/{wsi}/stride-4.csv",
                      index_col=0)
    assert "G1" in out.columns and out["G1"].notna().sum() > 5


@pytest.mark.slow
def test_cli_visualize_breast_st_layout(tmp_path, monkeypatch):
    """Breast-ST layout: wsis/, masks/, metadata/*.json magnification."""
    import json as _json

    from sequoia_tpu.cli import visualize as cv

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    wsi = "BC23450.tif"

    slide = synthetic_wsi()
    for d in ("wsis", "masks", "metadata"):
        os.makedirs(f"Breast-ST/{d}", exist_ok=True)
    native.write_tiled_tiff(f"Breast-ST/wsis/{wsi}",
                            [slide.levels[0], slide.levels[1]], tile=(128, 128))
    mask, _ = patch_gen.compute_slide_mask(slide)
    np.save(f"Breast-ST/masks/{wsi.replace('.tif', '.npy')}", mask)
    with open(f"Breast-ST/metadata/{wsi.replace('.tif', '.json')}", "w") as f:
        _json.dump({"magnification": "20x"}, f)

    genes = ["G0", "G1"]
    ckpt_dir = "vis_resnet/bst/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = vis.ViSConfig(num_outputs=2, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    checkpoint.save_torch_state_dict(
        convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(0))),
        os.path.join(ckpt_dir, "model_best_0.pt"))
    with open(os.path.join(ckpt_dir, "test_results.pkl"), "wb") as f:
        pickle.dump({"genes": genes}, f)

    cv.main(["--study", "bst", "--project", "Breast-ST",
             "--gene_names", "G0", "--wsi_file_name", wsi,
             "--save_folder", "maps", "--model_type", "vis",
             "--feat_type", "resnet", "--folds", "0", "--stride", "4",
             "--patch_size", "64", "--weights", "random",
             "--batch_size", "32"])

    out = pd.read_csv(f"visualizations/Breast-ST/maps/{wsi}/stride-4.csv",
                      index_col=0)
    assert "G0" in out.columns and out["G0"].notna().sum() > 5


@pytest.mark.slow
def test_cli_visualize_data_parallel_matches_single(tmp_path, monkeypatch):
    """--data_parallel (mesh-sharded featurize + window stage) produces the
    same stride CSV as the single-device run, to device-f32 tolerance."""
    from sequoia_tpu.cli import visualize as cv

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")

    monkeypatch.chdir(tmp_path)
    project = "TCGA-SYN"
    wsi = "TCGA-AA-0002.svs"
    stem = wsi.replace(".svs", "")
    slide = synthetic_wsi()
    os.makedirs(f"TCGA/{project}", exist_ok=True)
    native.write_tiled_tiff(f"TCGA/{project}/{wsi}",
                            [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))
    from sequoia_tpu.pipeline import patch_gen
    mask, _ = patch_gen.compute_slide_mask(slide)
    os.makedirs(f"TCGA/{project}_Masks/{stem}", exist_ok=True)
    np.save(f"TCGA/{project}_Masks/{stem}/mask.npy", mask)

    genes = [f"G{i}" for i in range(6)]
    ckpt_dir = "vis_resnet/syn/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = vis.ViSConfig(num_outputs=6, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    for fold in range(2):
        params = vis.init(cfg, jax.random.PRNGKey(fold))
        name = "model_best.pt" if fold == 0 else f"model_best_{fold}.pt"
        checkpoint.save_torch_state_dict(convert.vis_to_torch(cfg, params),
                                         os.path.join(ckpt_dir, name))
    with open(os.path.join(ckpt_dir, "test_results.pkl"), "wb") as f:
        pickle.dump({"genes": genes}, f)

    base = ["--study", "syn", "--project", project, "--gene_names", "G1,G4",
            "--wsi_file_name", wsi, "--model_type", "vis",
            "--feat_type", "resnet", "--folds", "0,1", "--stride", "4",
            "--patch_size", "64", "--weights", "random",
            "--batch_size", "32"]
    cv.main(base + ["--save_folder", "single"])
    cv.main(base + ["--save_folder", "sharded", "--data_parallel"])

    a = pd.read_csv(f"visualizations/{project}/single/{wsi}/stride-4.csv",
                    index_col=0)
    b = pd.read_csv(f"visualizations/{project}/sharded/{wsi}/stride-4.csv",
                    index_col=0)
    for col in ("G1_0", "G1_1", "G1", "G4"):
        np.testing.assert_allclose(b[col].to_numpy(), a[col].to_numpy(),
                                   rtol=2e-4, atol=2e-5)
