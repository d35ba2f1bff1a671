"""Raw subsampled-YCbCr decode path: native reader + device reconstruction.

The bandwidth-saving serving path ships raw chroma-subsampled planes to the
device (1.5 B/px at 4:2:0 vs 3 B/px RGB) and reconstructs RGB there.  The
contract under test: ``ops.ycbcr.planar_to_rgb`` over
``NativeTiffReader.read_regions_ycbcr`` is BIT-EXACT vs the reader's own
RGB path (libtiff JPEGCOLORMODE_RGB = libjpeg fancy upsample + integer
ycc->rgb), for every supported subsampling, on multi-tile slides.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sequoia_tpu.ops import ycbcr

native = pytest.importorskip("sequoia_tpu.native")
if not native.available():
    pytest.skip("native library not built", allow_module_level=True)

T = 64  # tile side (multiple of 16 for JPEG MCUs)


def _slide(tmp_path, sub, name="s", grid=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (grid * T, grid * T, 3), dtype=np.uint8)
    path = str(tmp_path / f"{name}.tiff")
    native.write_tiled_tiff(path, [img], tile=(T, T), jpeg_quality=80,
                            subsampling=sub)
    return path


@pytest.mark.parametrize("sub", [(2, 2), (2, 1), (1, 1)])
def test_raw_ycbcr_bit_exact_vs_rgb_path(tmp_path, sub):
    # (2, 2)/(1, 1) decode through libtiff's raw mode; (2, 1) = 4:2:2
    # (Aperio GT450) takes the libjpeg-direct tile decode — all three must
    # be bit-exact vs the RGB path after device-side reconstruction.
    r = native.NativeTiffReader(_slide(tmp_path, sub))
    assert r.ycbcr_subsampling(0, (T, T)) == sub
    coords = [(x * T, y * T) for x in range(3) for y in range(3)]
    rgb = r.read_regions(coords, 0, (T, T))
    raw = r.read_regions_ycbcr(coords, 0, (T, T))
    ny, nc = ycbcr.planar_sizes(T, T, *sub)
    assert raw.shape == (9, ny + 2 * nc)
    np.testing.assert_array_equal(ycbcr.planar_to_rgb(raw, T, T, *sub), rgb)
    r.close()


def test_jnp_matches_numpy_twin_bit_exact():
    rng = np.random.default_rng(3)
    for sub in [(2, 2), (2, 1), (1, 1)]:
        ny, nc = ycbcr.planar_sizes(T, T, *sub)
        buf = rng.integers(0, 256, (5, ny + 2 * nc), dtype=np.uint8)
        want = ycbcr.planar_to_rgb(buf, T, T, *sub)
        got = jax.jit(lambda b, s=sub: ycbcr.planar_to_rgb(b, T, T, *s))(
            jnp.asarray(buf))
        np.testing.assert_array_equal(np.asarray(got), want)


def test_h2v1_fancy_matches_libjpeg_scalar_transcription():
    """Pin the vectorized h2v1 upsampler against a direct scalar
    transcription of jdsample.c h2v1_fancy_upsample — an independent oracle
    from the native reader's libjpeg-direct 4:2:2 path (which the
    bit-exact test above exercises end-to-end)."""
    rng = np.random.default_rng(4)
    p = rng.integers(0, 256, (2, 7, 9), dtype=np.int64).astype(np.int32)

    def scalar_h2v1(row):
        w = len(row)
        out = np.empty(2 * w, np.int32)
        out[0] = row[0]
        out[1] = (row[0] * 3 + row[1] + 2) >> 2
        for k in range(1, w - 1):
            out[2 * k] = (row[k] * 3 + row[k - 1] + 1) >> 2
            out[2 * k + 1] = (row[k] * 3 + row[k + 1] + 2) >> 2
        out[2 * w - 2] = (row[w - 1] * 3 + row[w - 2] + 1) >> 2
        out[2 * w - 1] = row[w - 1]
        return out

    want = np.stack([np.stack([scalar_h2v1(r) for r in im]) for im in p])
    np.testing.assert_array_equal(ycbcr.fancy_upsample_h2v1(p), want)


def test_unsupported_layouts_fall_back(tmp_path):
    # 1x2 subsampling: no libjpeg fancy-upsample equivalent exists for the
    # device-side bit-exact reconstruction, so the probe must reject it
    r = native.NativeTiffReader(_slide(tmp_path, (1, 2), name="s12"))
    assert r.ycbcr_subsampling(0, (T, T)) is None
    with pytest.raises(OSError):
        r.read_regions_ycbcr([(0, 0)], 0, (T, T))
    r.close()
    # uncompressed RGB tiles: no raw path
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (T, T, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.tiff")
    native.write_tiled_tiff(p, [img], tile=(T, T))
    r = native.NativeTiffReader(p)
    assert r.ycbcr_subsampling(0, (T, T)) is None
    r.close()


def test_unaligned_or_partial_requests_rejected(tmp_path):
    r = native.NativeTiffReader(_slide(tmp_path, (2, 2), name="al"))
    with pytest.raises(OSError):  # not tile-aligned
        r.read_regions_ycbcr([(T // 2, 0)], 0, (T, T))
    with pytest.raises(OSError):  # wrong request size vs tile dims
        r.read_regions_ycbcr([(0, 0)], 0, (T // 2, T // 2))
    # RGB path still serves both
    assert r.read_regions([(T // 2, 0)], 0, (T, T)).shape == (1, T, T, 3)
    r.close()
