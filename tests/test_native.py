"""Native C++ tile reader tests (skipped when the toolchain/libtiff is
unavailable)."""

import os

import numpy as np
import pytest

native = pytest.importorskip("sequoia_tpu.native")
if not native.available():
    pytest.skip("native library not built", allow_module_level=True)


@pytest.fixture()
def tiled_pyramid(tmp_path):
    rng = np.random.default_rng(0)
    lv0 = rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    lv1 = lv0[::4, ::4].copy()
    path = str(tmp_path / "pyr_tiled.tiff")
    native.write_tiled_tiff(path, [lv0, lv1], tile=(64, 64))
    return path, lv0, lv1


def test_tiled_read_region(tiled_pyramid):
    path, lv0, lv1 = tiled_pyramid
    r = native.NativeTiffReader(path)
    assert r.level_dimensions == [(400, 300), (100, 75)]
    # unaligned region spanning multiple tiles
    reg = r.read_region((37, 99), 0, (150, 80))
    np.testing.assert_array_equal(reg, lv0[99:179, 37:187])
    # level-1 region with level-0 coordinates
    reg1 = r.read_region((40, 100), 1, (20, 10))
    np.testing.assert_array_equal(reg1, lv1[25:35, 10:30])
    # out-of-bounds tail zero-padded
    reg2 = r.read_region((392, 296), 0, (16, 16))
    np.testing.assert_array_equal(reg2[:4, :8], lv0[296:300, 392:400])
    assert (reg2[4:] == 0).all() and (reg2[:, 8:] == 0).all()


def test_batched_parallel_reads(tiled_pyramid):
    path, lv0, _ = tiled_pyramid
    r = native.NativeTiffReader(path)
    rng = np.random.default_rng(1)
    locs = [(int(x), int(y)) for x, y in
            zip(rng.integers(0, 336, 40), rng.integers(0, 236, 40))]
    batch = r.read_regions(locs, 0, (64, 64), nthreads=8)
    assert batch.shape == (40, 64, 64, 3)
    for i, (x, y) in enumerate(locs):
        np.testing.assert_array_equal(batch[i], lv0[y:y + 64, x:x + 64])


def test_strip_tiff_via_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    lv0 = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    p = str(tmp_path / "strips.tiff")
    Image.fromarray(lv0).save(p)
    r = native.NativeTiffReader(p)
    reg = r.read_region((10, 20), 0, (32, 16))
    np.testing.assert_array_equal(reg, lv0[20:36, 10:42])


def test_open_slide_prefers_native(tiled_pyramid):
    from sequoia_tpu.data import wsi

    path, lv0, _ = tiled_pyramid
    r = wsi.open_slide(path)
    assert isinstance(r, native.NativeTiffReader)
    batch = wsi.read_regions(r, [(0, 0), (64, 64)], 0, (32, 32))
    np.testing.assert_array_equal(batch[1], lv0[64:96, 64:96])


def test_open_slide_ignores_stub_openslide(tiled_pyramid, monkeypatch):
    """A bare `openslide` module in sys.modules (the parity gate stubs one
    to import the reference's visualize.py) must not shadow the native
    backend — open_slide probes for the OpenSlide class, not the import."""
    import sys
    import types

    from sequoia_tpu.data import wsi

    path, _, _ = tiled_pyramid
    monkeypatch.setitem(sys.modules, "openslide",
                        types.ModuleType("openslide"))
    r = wsi.open_slide(path)
    assert isinstance(r, native.NativeTiffReader)


def test_reference_visualize_loader_cleans_stubs():
    """load_reference_visualize must not leave its openslide/timm/
    torchvision stubs in sys.modules (a leaked stub broke open_slide for
    every later test in the session)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    from tools import reference_loader as rl

    if not rl.reference_available():
        pytest.skip("reference checkout unavailable")
    before = {n: sys.modules.get(n)
              for n in ("openslide", "timm", "torchvision", "scanpy", "ot")}
    rl.load_reference_visualize()
    rl.load_reference_get_emd()
    after = {n: sys.modules.get(n) for n in before}
    assert after == before


@pytest.mark.slow
def test_patch_gen_with_native_reader(tmp_path):
    """Full tiling stage through the native decoder."""
    from sequoia_tpu.pipeline import patch_gen
    from tests.test_pipeline_e2e import synthetic_wsi

    arr = synthetic_wsi()
    path = str(tmp_path / "synth_tiled.tiff")
    native.write_tiled_tiff(path, [arr.levels[0], arr.levels[1]], tile=(128, 128))

    n = patch_gen.extract_patches(path, str(tmp_path / "p"), str(tmp_path / "m"),
                                  "NATIVE-1", (64, 64),
                                  max_patches_per_slide=30, verbose=False)
    assert n > 10


def test_associated_images_not_pyramid_levels(tmp_path):
    """SVS-style associated images (stripped label/macro directories after
    the pyramid) must NOT appear in level_dimensions — the tissue masker
    takes the smallest 'level' and would otherwise mask the label photo."""
    from PIL import Image

    rng = np.random.default_rng(3)
    main = rng.integers(0, 255, size=(160, 240, 3), dtype=np.uint8)
    label = rng.integers(0, 255, size=(60, 60, 3), dtype=np.uint8)  # square
    p = str(tmp_path / "with_label.tiff")
    # PIL writes stripped pages: page 0 = main image, page 1 = label.
    # dir 0 is always kept (even stripped); later stripped dirs are not.
    Image.fromarray(main).save(
        p, save_all=True, append_images=[Image.fromarray(label)])
    r = native.NativeTiffReader(p)
    assert r.level_dimensions == [(240, 160)]
    r.close()


@pytest.fixture()
def jpeg_svs_pyramid(tmp_path):
    """Aperio-SVS-style slide: JPEG-compressed YCbCr tiles + '|'-delimited
    ImageDescription metadata — the on-disk layout of real TCGA slides
    (reference patch_gen_hdf5.py:68,86-89 reads AppMag through OpenSlide).
    Smooth gradient content keeps the JPEG round-trip error tiny."""
    yy, xx = np.mgrid[0:300, 0:400]
    lv0 = np.stack([xx * 255 // 400, yy * 255 // 300, (xx + yy) * 255 // 700],
                   axis=-1).astype(np.uint8)
    lv1 = lv0[::4, ::4].copy()
    path = str(tmp_path / "pyr_jpeg.svs.tiff")
    native.write_tiled_tiff(
        path, [lv0, lv1], tile=(64, 64), jpeg_quality=90,
        description="Aperio Image Library v12.0.15\n"
                    "400x300 (64x64) JPEG/RGB Q=90|AppMag = 20|MPP = 0.5040")
    return path, lv0, lv1


def test_jpeg_svs_read_and_properties(jpeg_svs_pyramid):
    path, lv0, lv1 = jpeg_svs_pyramid
    r = native.NativeTiffReader(path)
    assert r.level_dimensions == [(400, 300), (100, 75)]
    # Aperio metadata round-trips through str_description parsing
    assert r.properties["aperio.AppMag"] == "20"
    assert r.properties["aperio.MPP"] == "0.5040"
    # unaligned multi-tile region: JPEG is lossy, so tolerance not equality
    reg = r.read_region((37, 99), 0, (150, 80)).astype(int)
    ref = lv0[99:179, 37:187].astype(int)
    d = np.abs(reg - ref)
    assert d.mean() < 2 and d.max() <= 12
    # level-1 read with level-0 coords
    reg1 = r.read_region((40, 100), 1, (20, 10)).astype(int)
    d1 = np.abs(reg1 - lv1[25:35, 10:30].astype(int))
    assert d1.max() <= 12
    # out-of-bounds tail stays zero-padded on the JPEG fast path too
    reg2 = r.read_region((392, 296), 0, (16, 16))
    assert (reg2[4:] == 0).all() and (reg2[:, 8:] == 0).all()
    r.close()


def test_jpeg_decode_matches_pil(jpeg_svs_pyramid):
    """The fast path (TIFFReadEncodedTile + JPEGCOLORMODE_RGB) must produce
    the SAME decoded pixels as Pillow's libtiff/libjpeg path — decode
    divergence would silently shift features between readers."""
    from PIL import Image

    path, _, _ = jpeg_svs_pyramid
    r = native.NativeTiffReader(path)
    try:
        pil = np.asarray(Image.open(path).convert("RGB"))
    except Exception:
        pytest.skip("Pillow cannot decode tiled JPEG TIFF here")
    np.testing.assert_array_equal(r.read_region((0, 0), 0, (400, 300)), pil)
    # batched parallel reads agree with the single-region path exactly
    locs = [(0, 0), (37, 99), (320, 220)]
    batch = r.read_regions(locs, 0, (64, 64), nthreads=4)
    for i, (x, y) in enumerate(locs):
        np.testing.assert_array_equal(batch[i],
                                      r.read_region((x, y), 0, (64, 64)))
    r.close()


def test_jpeg_writer_rejects_non_mcu_tiles(tmp_path):
    """JPEG 2x2-subsampled MCUs need multiple-of-16 tile dims; a silent
    libtiff failure here would surface as unreadable fixtures later."""
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="multiple-of-16"):
        native.write_tiled_tiff(str(tmp_path / "bad.tiff"), [img],
                                tile=(60, 60), jpeg_quality=90)


def test_open_slide_jpeg_appmag_resize_factor(jpeg_svs_pyramid):
    """open_slide + the tiling stage's AppMag math work on a JPEG slide:
    AppMag 20 in the description -> resize_factor 1.0 (patch_gen_hdf5.py's
    aperio.AppMag/20 rule)."""
    from sequoia_tpu.data import wsi
    from sequoia_tpu.pipeline import patch_gen

    path, _, _ = jpeg_svs_pyramid
    slide = wsi.open_slide(path)
    assert isinstance(slide, native.NativeTiffReader)
    assert patch_gen.resize_factor(slide) == 1.0


def test_unloadable_library_degrades_to_unavailable(tmp_path, monkeypatch):
    """A present-but-unloadable .so (wrong arch / missing libtiff) must make
    available() return False, not raise out of get_lib()."""
    bad = tmp_path / "libsequoia_native.so"
    bad.write_bytes(b"not an ELF file")
    monkeypatch.setattr(native, "_LIB_PATH", str(bad))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    # make the staleness check accept the bogus .so so CDLL is reached
    monkeypatch.setattr(native, "_stale", lambda: False)
    assert native.available() is False


def _first_ifd_tag(path, tag):
    """Minimal classic-TIFF IFD walk: (count, values) of `tag` in dir 0.
    Test-only helper to locate tile offsets/bytecounts for fault injection."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    bo = "<" if data[:2] == b"II" else ">"
    assert struct.unpack(bo + "H", data[2:4])[0] == 42  # classic TIFF
    (ifd,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd:ifd + 2])
    sizes = {3: 2, 4: 4}
    fmts = {3: "H", 4: "I"}
    for i in range(n):
        e = ifd + 2 + 12 * i
        t, typ, cnt = struct.unpack(bo + "HHI", data[e:e + 8])
        if t != tag:
            continue
        size = sizes[typ] * cnt
        off = e + 8 if size <= 4 else struct.unpack(bo + "I",
                                                    data[e + 8:e + 12])[0]
        vals = struct.unpack(bo + fmts[typ] * cnt, data[off:off + size])
        return vals
    raise AssertionError(f"tag {tag} not found")


def test_corrupt_tile_rgb_tolerant_raw_strict(tmp_path):
    """Per-tile quarantine asymmetry, by design: a corrupt JPEG tile decodes
    to BLACK on the tolerant RGB path (pipeline keeps going; the tissue
    screen drops it) but FAILS the raw-YCbCr batch loudly (silent black
    planes would feed the model wrong pixels with no screen to catch the
    downstream reconstruction).  Holds for both raw decode routes: 4:2:0
    (libtiff raw mode) and 4:2:2 (libjpeg-direct)."""
    T = 64
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (3 * T, 3 * T, 3), dtype=np.uint8)
    for sub in [(2, 2), (2, 1)]:
        path = str(tmp_path / f"c{sub[0]}{sub[1]}.tiff")
        native.write_tiled_tiff(path, [img], tile=(T, T), jpeg_quality=80,
                                subsampling=sub)
        coords = [(x * T, y * T) for y in range(3) for x in range(3)]
        clean = native.NativeTiffReader(path)  # pre-corruption decode
        want = clean.read_regions(coords, 0, (T, T))
        clean.close()
        offs = _first_ifd_tag(path, 324)   # TileOffsets
        cnts = _first_ifd_tag(path, 325)   # TileByteCounts
        with open(path, "r+b") as f:       # stomp tile 4 (center): no SOI
            f.seek(offs[4])
            f.write(b"\x00" * cnts[4])

        r = native.NativeTiffReader(path)
        out = r.read_regions(coords, 0, (T, T))
        assert (out[4] == 0).all(), "corrupt tile must decode to black"
        good = [i for i in range(9) if i != 4]
        for i in good:  # neighbors unaffected (JPEG is lossy: compare
            # against the clean file's own decode, not the source pixels)
            np.testing.assert_array_equal(out[i], want[i])
        assert r.ycbcr_subsampling(0, (T, T)) == sub
        with pytest.raises(OSError, match="decoded"):
            r.read_regions_ycbcr(coords, 0, (T, T))
        # intact tiles still serve raw individually
        ok = r.read_regions_ycbcr([coords[0]], 0, (T, T))
        assert ok.shape[0] == 1
        r.close()
