"""ctypes binding for the native C++ tile reader (``tiffreader.cpp``).

Builds on demand with ``make`` (g++ + libtiff); everything degrades
gracefully to the pure-Python readers in ``sequoia_tpu.data.wsi`` when the
toolchain or libtiff is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsequoia_native.so")
_lib = None
_build_failed = False


def _stale() -> bool:
    """True when the .so predates a source edit (mtime check: the exists()
    shortcut alone would keep loading a stale binary after a cpp change)."""
    try:
        so = os.path.getmtime(_LIB_PATH)
        return any(os.path.getmtime(os.path.join(_DIR, src)) > so
                   for src in ("tiffreader.cpp", "Makefile"))
    except OSError:
        return True


def build(quiet: bool = True) -> bool:
    """Compile the native library if needed.  Returns availability."""
    global _build_failed
    if os.path.exists(_LIB_PATH) and not _stale():
        return True
    if _build_failed:
        return False
    try:
        subprocess.run(["make", "-C", _DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        _build_failed = True
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if not build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # .so exists but cannot load (missing libtiff, wrong arch):
        # degrade gracefully like a failed build — available() must
        # return False, not raise
        _build_failed = True
        return None
    lib.str_open.restype = ctypes.c_void_p
    lib.str_open.argtypes = [ctypes.c_char_p]
    lib.str_num_levels.restype = ctypes.c_int
    lib.str_num_levels.argtypes = [ctypes.c_void_p]
    lib.str_level_size.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.str_read_region.restype = ctypes.c_int
    lib.str_read_region.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_uint8)]
    lib.str_read_regions.restype = ctypes.c_int
    lib.str_read_regions.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.c_int,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int]
    lib.str_close.argtypes = [ctypes.c_void_p]
    lib.str_description.restype = ctypes.c_int
    lib.str_description.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int]
    lib.str_write_tiled.restype = ctypes.c_int
    lib.str_write_tiled.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_void_p),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.str_tile_dims.restype = ctypes.c_int
    lib.str_tile_dims.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.str_ycbcr_ok.restype = ctypes.c_int
    lib.str_ycbcr_ok.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.str_read_regions_ycbcr.restype = ctypes.c_int
    lib.str_read_regions_ycbcr.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.POINTER(ctypes.c_int64),
                                           ctypes.POINTER(ctypes.c_int64),
                                           ctypes.c_int,
                                           ctypes.c_int64, ctypes.c_int64,
                                           ctypes.POINTER(ctypes.c_uint8),
                                           ctypes.c_int]
    lib.str_write_tiled_ex.restype = ctypes.c_int
    lib.str_write_tiled_ex.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_void_p),
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_char_p]
    lib.str_write_tiled_ex2.restype = ctypes.c_int
    lib.str_write_tiled_ex2.argtypes = (lib.str_write_tiled_ex.argtypes
                                        + [ctypes.c_int, ctypes.c_int])
    _lib = lib
    return _lib


def write_tiled_tiff(path: str, levels: list[np.ndarray],
                     tile: tuple[int, int] = (64, 64),
                     jpeg_quality: int = 0,
                     description: str = "",
                     subsampling: tuple[int, int] = (2, 2)) -> None:
    """Write (h, w, 3) uint8 arrays as a tiled pyramidal TIFF (test/dev
    helper; exercises the tiled decode path).

    ``jpeg_quality`` > 0 writes JPEG-compressed YCbCr tiles — the on-disk
    layout of real Aperio SVS slides (tile dims must be multiples of 16) —
    so fixtures exercise the exact decode path production slides take.
    ``description`` is stored as level 0's ImageDescription; an
    Aperio-style string ("...|AppMag = 20|MPP = 0.5") round-trips through
    ``NativeTiffReader.properties``.  ``subsampling`` sets the JPEG chroma
    subsampling: (2, 2) = 4:2:0 (our default), (2, 1) = 4:2:2 (Aperio
    GT450), (1, 1) = 4:4:4."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    levels = [np.ascontiguousarray(lv, np.uint8) for lv in levels]
    bufs = (ctypes.c_void_p * len(levels))(
        *[lv.ctypes.data_as(ctypes.c_void_p) for lv in levels])
    ws = np.asarray([lv.shape[1] for lv in levels], np.int64)
    hs = np.asarray([lv.shape[0] for lv in levels], np.int64)
    rc = lib.str_write_tiled_ex2(
        path.encode(), bufs,
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(levels), tile[0], tile[1], jpeg_quality, description.encode(),
        subsampling[0], subsampling[1])
    if rc == -4:
        raise ValueError(f"JPEG tiles need multiple-of-16 dims, got {tile}")
    if rc == -5:
        raise ValueError(f"unsupported subsampling {subsampling}")
    if rc != 0:
        raise OSError(f"str_write_tiled_ex failed (rc={rc})")


def available() -> bool:
    return get_lib() is not None


class NativeTiffReader:
    """SlideReader-protocol WSI reader backed by the C++ thread-pool decoder.

    ``read_region`` takes level-0 coordinates (OpenSlide convention);
    ``read_regions`` decodes a batch of equal-size regions in parallel
    without the GIL — the fast path for tiling and sliding-window
    featurization.
    """

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native tile reader unavailable (build failed)")
        self._lib = lib
        self._h = lib.str_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open TIFF: {path}")
        n = lib.str_num_levels(self._h)
        self.level_dimensions = []
        for i in range(n):
            w, h = ctypes.c_int(), ctypes.c_int()
            lib.str_level_size(self._h, i, ctypes.byref(w), ctypes.byref(h))
            self.level_dimensions.append((w.value, h.value))
        self.properties: dict = self._parse_properties()

    def _parse_properties(self) -> dict:
        buf = ctypes.create_string_buffer(65536)
        n = self._lib.str_description(self._h, buf, len(buf))
        props: dict = {}
        if n > 0:
            desc = buf.value.decode(errors="replace")
            props["tiff.ImageDescription"] = desc
            # Aperio SVS: "Aperio ...|AppMag = 40|MPP = 0.25|..."
            for part in desc.split("|"):
                if "=" in part:
                    k, _, v = part.partition("=")
                    k, v = k.strip(), v.strip()
                    if k == "AppMag":
                        props["aperio.AppMag"] = v
                    elif k == "MPP":
                        props["aperio.MPP"] = v
        return props

    @property
    def dimensions(self):
        return self.level_dimensions[0]

    def _to_level(self, x0: int, y0: int, level: int) -> tuple[int, int]:
        lw = self.level_dimensions[level][0]
        if lw <= 0:  # hostile header: declared zero-width level
            raise OSError(f"level {level} has non-positive width {lw}")
        ds = self.level_dimensions[0][0] / lw
        return int(x0 / ds), int(y0 / ds)

    def read_region(self, location, level, size) -> np.ndarray:
        x, y = self._to_level(location[0], location[1], level)
        w, h = size
        out = np.empty((h, w, 3), np.uint8)  # C memsets it (or rc!=0 raises)
        rc = self._lib.str_read_region(
            self._h, level, x, y, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise OSError(f"read_region failed (rc={rc})")
        return out

    def read_regions(self, locations, level, size,
                     nthreads: int = 8) -> np.ndarray:
        """Batch decode: [(x0, y0), ...] level-0 coords -> (n, h, w, 3)."""
        w, h = size
        n = len(locations)
        xs = np.empty(n, np.int64)
        ys = np.empty(n, np.int64)
        for i, (x0, y0) in enumerate(locations):
            xs[i], ys[i] = self._to_level(x0, y0, level)
        # np.empty: the C side memsets every region it touches; regions it
        # does NOT touch are whole-region failures, which raise below
        out = np.empty((n, h, w, 3), np.uint8)
        ok = self._lib.str_read_regions(
            self._h, level,
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nthreads)
        if ok != n:
            # silently returning black tiles would feed the model wrong
            # pixels; the per-slide quarantine upstream handles the raise
            raise OSError(f"read_regions decoded {ok}/{n} regions")
        return out

    def tile_dims(self, level: int) -> tuple[int, int] | None:
        """(tile_width, tile_height) of a tiled level, else None.  The
        mosaic serving path plans whole-tile raw-YCbCr reads from this when
        the on-disk tile dims differ from the patch size (real Aperio SVS:
        240px tiles vs 256px patches)."""
        tw, th = ctypes.c_int(), ctypes.c_int()
        ok = self._lib.str_tile_dims(self._h, level, ctypes.byref(tw),
                                     ctypes.byref(th))
        return (tw.value, th.value) if ok else None

    def ycbcr_subsampling(self, level: int, size) -> tuple[int, int] | None:
        """Chroma subsampling (sh, sv) when whole-``size``-tile requests at
        ``level`` can be served as raw subsampled YCbCr (JPEG tiles, tile
        dims == size), else None.  See :meth:`read_regions_ycbcr`."""
        sh, sv = ctypes.c_int(), ctypes.c_int()
        ok = self._lib.str_ycbcr_ok(self._h, level, size[0], size[1],
                                    ctypes.byref(sh), ctypes.byref(sv))
        return (sh.value, sv.value) if ok else None

    def read_regions_ycbcr(self, locations, level, size,
                           nthreads: int = 8) -> np.ndarray:
        """Batch raw-YCbCr whole-tile decode: [(x0, y0), ...] level-0 coords
        (each a tile-aligned full tile) -> (n, w*h + 2*(w/sh)*(h/sv)) uint8,
        each row planar Y ++ Cb ++ Cr at 1.5 B/px for 2x2 subsampling —
        half the host->device bytes of the RGB path.  Convert on device
        with ``sequoia_tpu.ops.ycbcr`` (bit-exact vs the RGB path)."""
        sub = self.ycbcr_subsampling(level, size)
        if sub is None:
            raise OSError("raw YCbCr path unsupported for this level/size")
        w, h = size
        shs, svs = sub
        n = len(locations)
        xs = np.empty(n, np.int64)
        ys = np.empty(n, np.int64)
        for i, (x0, y0) in enumerate(locations):
            xs[i], ys[i] = self._to_level(x0, y0, level)
        stride = w * h + 2 * (w // shs) * (h // svs)
        out = np.empty((n, stride), np.uint8)
        ok = self._lib.str_read_regions_ycbcr(
            self._h, level,
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nthreads)
        if ok != n:
            raise OSError(f"read_regions_ycbcr decoded {ok}/{n} regions "
                          "(tile-aligned whole tiles only)")
        return out

    def close(self):
        if self._h:
            self._lib.str_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
