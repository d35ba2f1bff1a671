"""Tile-mosaic raw-YCbCr serving path (ops/mosaic.py + serve 'mosaic' mode).

Real Aperio slides store 240px JPEG tiles while patches are 256px
(reference ``patch_gen_hdf5.py:86-89``), so the whole-tile raw path must
assemble patches from tile neighborhoods.  Contracts under test:

* the planner covers every candidate exactly once within its tile budget;
* device assembly (per-tile reconstruction + gather + dynamic-slice +
  bounds masking) is BIT-EXACT vs the reader's RGB ``read_regions``;
* serve picks the mode for tile-dims != patch-size slides and its
  predictions match ``predict_patches(extract_patches(...))`` including
  the shuffle-order ``max_patches`` cap semantics.
"""

import numpy as np
import pytest

import jax

from sequoia_tpu.ops import mosaic

native = pytest.importorskip("sequoia_tpu.native")
if not native.available():
    pytest.skip("native library not built", allow_module_level=True)

T = 48   # tile side: multiple of 16 (JPEG MCUs), != the 64px patch
PS = 64


def _tissue_slide(tmp_path, w, h, name="m", seed=3, tile=T, sub=(2, 2)):
    rng = np.random.default_rng(seed)
    lv0 = np.empty((h, w, 3), np.uint8)
    lv0[..., 0] = rng.integers(150, 220, (h, w))
    lv0[..., 1] = rng.integers(60, 140, (h, w))
    lv0[..., 2] = rng.integers(150, 230, (h, w))
    path = str(tmp_path / f"{name}.tiff")
    native.write_tiled_tiff(path, [lv0, lv0[::4, ::4]], tile=(tile, tile),
                            jpeg_quality=80, subsampling=sub,
                            description="synthetic|AppMag = 20")
    return path


def _grid_coords(w, h, ps=PS, seed=5):
    # the reference's shuffled candidate enumeration (patch_gen_hdf5.py:100)
    coords = [(x, y) for x in range(0, w, ps) for y in range(0, h, ps)]
    np.random.seed(seed)
    np.random.shuffle(coords)
    return coords


def test_planner_covers_every_candidate_once_within_budget():
    w, h = 9 * PS + 31, 7 * PS + 9
    coords = _grid_coords(w, h)
    budget = mosaic.block_tile_capacity(4, PS, T, T)
    chunks = list(mosaic.plan_chunks(coords, PS, (T, T), (w, h),
                                     tile_budget=budget, block=4))
    origs = np.concatenate([c.orig for c in chunks])
    assert sorted(origs.tolist()) == list(range(len(coords)))
    for c in chunks:
        assert len(c.tiles) <= budget
        assert c.idx.shape == (len(c.orig), c.idx.shape[1])
        # in-grid slots reference the chunk's own tiles; padding slot is
        # the static budget index
        real = c.idx[c.idx < budget]
        assert real.max() < len(c.tiles)


# (2, 2) = 4:2:0 (classic Aperio), (2, 1) = 4:2:2 (GT450 — the libjpeg-
# direct native decode path)
@pytest.mark.parametrize("sub", [(2, 2), (2, 1)])
def test_assembly_bit_exact_vs_rgb_read_regions(tmp_path, sub):
    w, h = 6 * PS + 40, 5 * PS + 16  # edge tiles on both axes
    path = _tissue_slide(tmp_path, w, h, sub=sub)
    r = native.NativeTiffReader(path)
    assert r.tile_dims(0) == (T, T)
    assert r.ycbcr_subsampling(0, (T, T)) == sub

    coords = _grid_coords(w, h)
    budget = mosaic.block_tile_capacity(4, PS, T, T)
    ky, kx = mosaic.neighborhood(coords, PS, T, T)
    # 64px grid offsets mod 48 cycle {0,16,32}: every window spans exactly 2
    assert (ky, kx) == (2, 2)
    asm = jax.jit(mosaic.make_assemble(PS, T, T, *sub, ky, kx))
    neutral = mosaic.neutral_planar(T, T, *sub)

    got = {}
    for c in mosaic.plan_chunks(coords, PS, (T, T), (w, h),
                                tile_budget=budget, block=4):
        locs = [(int(tx * T), int(ty * T)) for tx, ty in c.tiles]
        packed = r.read_regions_ycbcr(locs, 0, (T, T))
        stack = np.empty((budget + 1, packed.shape[1]), np.uint8)
        stack[:len(packed)] = packed
        stack[len(packed):] = neutral
        out = np.asarray(asm(stack, c.idx, c.offs, c.wh))
        for o, patch in zip(c.orig, out):
            got[int(o)] = patch

    want = r.read_regions(coords, 0, (PS, PS))
    for i in range(len(coords)):
        np.testing.assert_array_equal(got[i], want[i])
    r.close()


@pytest.mark.slow
@pytest.mark.parametrize("sub", [(2, 2), (2, 1)])
def test_serve_mosaic_mode_matches_predict_patches(tmp_path, sub):
    from test_serve_and_ckpt import make_predictor

    path = _tissue_slide(tmp_path, 6 * PS + 40, 5 * PS + 16, sub=sub)
    pred = make_predictor()
    tup = pred._start_producer(path)
    assert tup[4] == "mosaic" and tup[5] == (T, T) + sub
    tup[3].set()
    tup[1].join(timeout=30)

    out = pred.predict_wsi(path)
    patches = pred.extract_patches(path)
    assert len(patches) > 0
    np.testing.assert_allclose(out, pred.predict_patches(patches),
                               rtol=2e-4, atol=1e-4)


@pytest.mark.slow
def test_serve_mosaic_cap_selection_matches_shuffle_order(tmp_path):
    """When max_patches binds, the mosaic path (spatial decode order) must
    keep the SAME patch set as the reference's shuffle-order cap — i.e.,
    exactly what extract_patches (host-screened, shuffle order) returns."""
    from test_serve_and_ckpt import make_predictor

    path = _tissue_slide(tmp_path, 8 * PS, 6 * PS, name="cap")
    pred = make_predictor()  # max_patches=48 binds on a 48-candidate grid
    pred.max_patches = 10
    tup = pred._start_producer(path)
    assert tup[4] == "mosaic"
    tup[3].set()
    tup[1].join(timeout=30)

    out = pred.predict_wsi(path)
    patches = pred.extract_patches(path)
    assert len(patches) == 10  # the cap binds
    np.testing.assert_allclose(out, pred.predict_patches(patches),
                               rtol=2e-4, atol=1e-4)


@pytest.mark.slow
def test_serve_mosaic_with_mesh_matches_single_device(tmp_path):
    from jax.sharding import Mesh
    from test_serve_and_ckpt import make_predictor

    from sequoia_tpu.models import resnet, vis
    from sequoia_tpu.pipeline.features import FeatureExtractor
    from sequoia_tpu.serve import SlidePredictor

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    path = _tissue_slide(tmp_path, 6 * PS + 40, 5 * PS + 16, name="mesh")

    single = make_predictor()
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4, 1),
                ("data", "model"))
    sharded = SlidePredictor(
        FeatureExtractor("resnet",
                         resnet.random_params(jax.random.PRNGKey(0)),
                         batch_size=16, patch_size=64, mesh=mesh),
        single.vis_models, n_clusters=8, max_patches=48, patch_size=64)

    tup = sharded._start_producer(path)
    assert tup[4] == "mosaic"
    tup[3].set()
    tup[1].join(timeout=30)
    out_single = single.predict_wsi(path)
    out_sharded = sharded.predict_wsi(path)
    np.testing.assert_allclose(out_sharded, out_single, rtol=2e-4, atol=1e-4)
