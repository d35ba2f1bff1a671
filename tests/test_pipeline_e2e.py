"""End-to-end pipeline: synthetic WSI -> tiles -> features -> k-means ->
dataset -> ViS prediction, exercising every on-disk contract."""

import pytest
import os

import h5py
import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.data.wsi import ArrayReader, PILReader
from sequoia_tpu.models import resnet, vis
from sequoia_tpu.pipeline import features as feat_stage
from sequoia_tpu.pipeline import kmeans_stage, patch_gen


def synthetic_wsi(w=2048, h=1536, seed=0):
    """Level-0 + 4x-downsampled level-1 pyramid with a pink tissue blob on a
    white background."""
    rng = np.random.default_rng(seed)
    lv0 = np.full((h, w, 3), 242, np.uint8)
    # tissue: left-center blob with texture
    ys, xs = np.mgrid[0:h, 0:w]
    blob = ((ys - h / 2) ** 2 / (h / 2.5) ** 2 + (xs - w / 3) ** 2 / (w / 3) ** 2) < 1
    tex = rng.integers(-40, 40, size=(h, w, 3))
    tissue_color = np.array([188, 105, 160])
    lv0[blob] = np.clip(tissue_color + tex, 0, 255).astype(np.uint8)[blob]
    lv1 = lv0[::4, ::4].copy()
    return ArrayReader([lv0, lv1], properties={"aperio.AppMag": "20"})


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    slide_id = "SYNTH-001"
    patch_dir = str(tmp_path / "patches")
    mask_dir = str(tmp_path / "masks")
    feat_dir = str(tmp_path / "features")

    # --- stage 1: tiling -------------------------------------------------
    n = patch_gen.extract_patches(
        synthetic_wsi(), patch_dir, mask_dir, slide_id,
        patch_size=(64, 64), max_patches_per_slide=80, verbose=False)
    assert n > 20
    h5_path = os.path.join(patch_dir, slide_id, slide_id + ".hdf5")
    with h5py.File(h5_path, "r") as f:
        keys = list(f.keys())
        assert len(keys) == n
        tile = f[keys[0]][:]
        assert tile.shape == (64, 64, 3) and tile.dtype == np.uint8
        # tiles named "x_y" with level-0 coords
        x, y = map(int, keys[0].split("_"))
        assert 0 <= x < 2048 and 0 <= y < 1536
    assert os.path.exists(os.path.join(patch_dir, slide_id, "complete.txt"))
    mask = np.load(os.path.join(mask_dir, slide_id, "mask.npy"))
    assert mask.shape == (512, 384)  # [x, y] layout of level-1

    # idempotent re-run
    assert patch_gen.extract_patches(synthetic_wsi(), patch_dir, mask_dir,
                                     slide_id, (64, 64), verbose=False) == -1

    # --- stage 2: features ------------------------------------------------
    df = pd.DataFrame([{"wsi_file_name": f"{slide_id}.svs", "patient_id": "P0",
                        "tcga_project": "TCGA-SYN",
                        **{f"rna_G{i}": float(i) for i in range(6)}}])
    extractor = feat_stage.FeatureExtractor(
        "resnet", resnet.random_params(jax.random.PRNGKey(0)), batch_size=32,
        patch_size=64)
    done = feat_stage.compute_features(df, patch_dir, feat_dir, extractor,
                                       max_patch_number=60, verbose=False)
    assert done == 1
    fpath = os.path.join(feat_dir, "TCGA-SYN", slide_id, slide_id + ".h5")
    with h5py.File(fpath, "r") as f:
        feats = f["resnet_features"][:]
    assert feats.shape == (60, 2048)
    assert np.isfinite(feats).all() and feats.std() > 0

    # sentinel skip on re-run
    assert feat_stage.compute_features(df, patch_dir, feat_dir, extractor,
                                       verbose=False) == 0

    # --- stage 3: k-means ---------------------------------------------------
    done = kmeans_stage.run_kmeans(df, feat_dir, num_clusters=8,
                                   backend="tpu", verbose=False)
    assert done == 1
    with h5py.File(fpath, "r") as f:
        cf = f["cluster_features"][:]
    assert cf.shape == (8, 2048) and np.isfinite(cf).all()

    # skip when present
    assert kmeans_stage.run_kmeans(df, feat_dir, num_clusters=8,
                                   verbose=False) == 0

    # --- stage 4: dataset + ViS prediction --------------------------------
    d = ds.FeatureDataset(df, feat_dir)
    assert d.feature_dim == 2048 and d.num_genes == 6
    cfg = vis.ViSConfig(num_outputs=6, input_dim=2048, depth=1, nheads=2,
                        dim_f=8, dim_s=8, dim_c=8, num_clusters=8)
    params = vis.init(cfg, jax.random.PRNGKey(1))
    batch = next(iter(ds.BatchLoader(d, 1)))
    pred = vis.apply(cfg, params, jnp.asarray(batch.features))
    assert pred.shape == (1, 6) and np.isfinite(np.asarray(pred)).all()


def test_kmeans_skips_small_slides(tmp_path):
    feat_dir = tmp_path / "features" / "TCGA-SYN" / "tiny"
    os.makedirs(feat_dir)
    with h5py.File(feat_dir / "tiny.h5", "w") as f:
        f.create_dataset("resnet_features", data=np.random.rand(5, 16).astype(np.float32))
    df = pd.DataFrame([{"wsi_file_name": "tiny", "patient_id": "P0",
                        "tcga_project": "TCGA-SYN", "rna_A": 0.0}])
    done = kmeans_stage.run_kmeans(df, str(tmp_path / "features"),
                                   num_clusters=100, verbose=False)
    assert done == 0
    with h5py.File(feat_dir / "tiny.h5", "r") as f:
        assert "cluster_features" not in f


def test_pil_reader_multipage(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    lv0 = rng.integers(0, 255, size=(256, 320, 3), dtype=np.uint8)
    lv1 = lv0[::4, ::4]
    p = str(tmp_path / "pyr.tiff")
    Image.fromarray(lv0).save(p, save_all=True,
                              append_images=[Image.fromarray(lv1)])
    r = PILReader(p)
    assert r.level_dimensions == [(320, 256), (80, 64)]
    region = r.read_region((64, 32), 0, (16, 16))
    np.testing.assert_array_equal(region, lv0[32:48, 64:80])
    region1 = r.read_region((64, 32), 1, (8, 8))
    np.testing.assert_array_equal(region1, lv1[8:16, 16:24])


@pytest.mark.slow
def test_packed_layout_matches_tiles(tmp_path):
    """layout='packed' writes the same screened patches as the reference
    tile-per-dataset layout, and load_patches reads both identically
    (including the subsample path)."""
    import random as pyrandom

    kw = dict(patch_size=(64, 64), max_patches_per_slide=40, verbose=False)
    n_t = patch_gen.extract_patches(
        synthetic_wsi(), str(tmp_path / "t"), str(tmp_path / "tm"), "S",
        **kw)
    n_p = patch_gen.extract_patches(
        synthetic_wsi(), str(tmp_path / "p"), str(tmp_path / "pm"), "S",
        layout="packed", **kw)
    assert n_t == n_p > 10

    with h5py.File(tmp_path / "t" / "S" / "S.hdf5", "r") as f:
        tiles = {k: f[k][:] for k in f.keys()}
    with h5py.File(tmp_path / "p" / "S" / "S.hdf5", "r") as f:
        assert set(f.keys()) == {"patches", "coords"}
        packed = f["patches"][:]
        coords = f["coords"][:]

    # same (x, y) -> pixel mapping in both layouts
    assert len(packed) == len(tiles)
    for img, (x, y) in zip(packed, coords):
        np.testing.assert_array_equal(img, tiles[f"{x}_{y}"])

    # reader parity: same seed -> bit-identical output from both layouts,
    # full and subsampled (same key universe, same rng.sample stream)
    for cap in (None, 10):
        a = feat_stage.load_patches(str(tmp_path / "t" / "S" / "S.hdf5"),
                                    cap, pyrandom.Random(0))
        b = feat_stage.load_patches(str(tmp_path / "p" / "S" / "S.hdf5"),
                                    cap, pyrandom.Random(0))
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_extract_patches_appmag_40(tmp_path):
    """Magnification-aware tiling (reference patch_gen_hdf5.py:86-89,
    116-117): at AppMag=40 the grid steps by 2x patch_size at level 0 and
    each region is resized back to patch_size before writing."""
    rng = np.random.default_rng(3)
    h, w = 1024, 1536
    lv0 = np.full((h, w, 3), 242, np.uint8)
    ys, xs = np.mgrid[0:h, 0:w]
    blob = ((ys - h/2)**2 / (h/2.2)**2 + (xs - w/3)**2 / (w/3)**2) < 1
    tex = rng.integers(-40, 40, size=(h, w, 3))
    lv0[blob] = np.clip(np.array([188, 105, 160]) + tex, 0, 255).astype(np.uint8)[blob]
    slide = ArrayReader([lv0, lv0[::4, ::4].copy()],
                        properties={"aperio.AppMag": "40"})

    n = patch_gen.extract_patches(
        slide, str(tmp_path / "p"), str(tmp_path / "m"), "S40",
        patch_size=(64, 64), max_patches_per_slide=30, verbose=False)
    assert n > 5
    with h5py.File(tmp_path / "p" / "S40" / "S40.hdf5", "r") as f:
        keys = list(f.keys())
        # written tiles are patch_size even though 128px regions were read
        for k in keys[:5]:
            assert f[k].shape == (64, 64, 3)
        # level-0 coords step by the resized size (2x 64)
        coords = np.array([list(map(int, k.split("_"))) for k in keys])
        assert (coords % 128 == 0).all()
