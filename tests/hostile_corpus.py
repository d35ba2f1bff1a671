"""Malformed-TIFF corpus for the native reader (hostile-input hardening).

The native C++ reader (``sequoia_tpu/native/tiffreader.cpp``) parses
untrusted TIFF/JPEG — the role OpenSlide's battle-tested decode plays for
the reference (``patch_gen_hdf5.py:68,108``).  libtiff is historically
CVE-rich, so every malformed input must surface as a Python-level error
(or a clean open failure), never a crash, hang, or sanitizer report.

Two pieces:

* :func:`build_corpus` — fabricates a small valid JPEG/YCbCr pyramid
  fixture, then derives ~25 hostile mutants by byte surgery (truncations,
  corrupt IFD offsets and loops, absurd tile dims, corrupt JPEGTables /
  byte counts / planar config / subsampling, deterministic bit flips).
  Mutation is pure byte-level work on the classic little-endian TIFF
  structure — no TIFF library involved, so mutants are exactly what a
  hostile file would contain.
* :func:`run_corpus` / ``__main__`` — opens and reads every corpus file
  through the full NativeTiffReader surface (open, read_region,
  read_regions, tile_dims, ycbcr probe + raw reads) and reports per-case
  outcomes as JSON.  Run in a SUBPROCESS by the tests so a crash is
  observed as a nonzero exit code instead of killing pytest; run with
  ``--lib libsequoia_native_asan.so`` under LD_PRELOADed libasan/libubsan
  for the sanitizer gate (``make -C sequoia_tpu/native asan``).
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

TILE = 64  # JPEG tiles need multiple-of-16 dims
SIDE = 4 * TILE


# ---------------------------------------------------------------------------
# classic little-endian TIFF structure surgery (no TIFF library)

def _ifd_offsets(data: bytes) -> list[int]:
    """Offsets of every IFD in a classic little-endian TIFF."""
    if data[:4] != b"II*\x00":
        raise ValueError("not a classic little-endian TIFF")
    offs = []
    off = struct.unpack_from("<I", data, 4)[0]
    while off and off + 2 <= len(data):
        offs.append(off)
        n = struct.unpack_from("<H", data, off)[0]
        nxt_pos = off + 2 + 12 * n
        if nxt_pos + 4 > len(data):
            break
        off = struct.unpack_from("<I", data, nxt_pos)[0]
    return offs


def _entries(data: bytes, ifd: int) -> list[tuple[int, int, int, int, int]]:
    """IFD -> [(entry_pos, tag, type, count, value_or_offset), ...]."""
    n = struct.unpack_from("<H", data, ifd)[0]
    out = []
    for i in range(n):
        pos = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", data, pos)
        val = struct.unpack_from("<I", data, pos + 8)[0]
        out.append((pos, tag, typ, cnt, val))
    return out


def _patch_entry_value(data: bytearray, ifd: int, tag: int,
                       new_value: int) -> bool:
    """Overwrite an IFD entry's inline value field (works for SHORT/LONG
    inline values; SHORT writes the low 16 bits)."""
    for pos, t, typ, cnt, _ in _entries(bytes(data), ifd):
        if t == tag:
            if typ == 3 and cnt == 1:  # SHORT
                struct.pack_into("<HH", data, pos + 8, new_value & 0xFFFF, 0)
            else:
                struct.pack_into("<I", data, pos + 8, new_value & 0xFFFFFFFF)
            return True
    return False


def _entry(data: bytes, ifd: int, tag: int):
    for e in _entries(data, ifd):
        if e[1] == tag:
            return e
    return None


# ---------------------------------------------------------------------------

def build_corpus(outdir: str) -> dict[str, str]:
    """Fabricate the valid fixture + hostile mutants; returns {name: path}.

    Must run with a working (non-sanitizer) native library — the mutants
    themselves are pure byte surgery afterwards.
    """
    from sequoia_tpu import native

    os.makedirs(outdir, exist_ok=True)
    valid = os.path.join(outdir, "valid.tiff")
    rng = np.random.default_rng(0)
    lv0 = rng.integers(0, 256, (SIDE, SIDE, 3), dtype=np.uint8)
    native.write_tiled_tiff(valid, [lv0, lv0[::4, ::4]], tile=(TILE, TILE),
                            jpeg_quality=80,
                            description="hostile fixture |AppMag = 20|")
    data = open(valid, "rb").read()
    ifds = _ifd_offsets(data)
    cases: dict[str, bytes] = {}

    cases["empty"] = b""
    cases["garbage"] = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    cases["short_header"] = data[:6]
    cases["header_only"] = data[:8]
    for pct in (10, 50, 90):
        cases[f"trunc_{pct}"] = data[: len(data) * pct // 100]

    # first-IFD offset beyond EOF / into the header
    m = bytearray(data)
    struct.pack_into("<I", m, 4, 0x7FFFFFF0)
    cases["ifd_offset_beyond_eof"] = bytes(m)
    m = bytearray(data)
    struct.pack_into("<I", m, 4, 2)
    cases["ifd_offset_in_header"] = bytes(m)

    # IFD loop: first IFD's next pointer -> itself (circular pyramid)
    m = bytearray(data)
    n = struct.unpack_from("<H", m, ifds[0])[0]
    struct.pack_into("<I", m, ifds[0] + 2 + 12 * n, ifds[0])
    cases["ifd_loop"] = bytes(m)

    # absurd entry count (claims 0xFFFF entries, runs off the file)
    m = bytearray(data)
    struct.pack_into("<H", m, ifds[0], 0xFFFF)
    cases["ifd_huge_entry_count"] = bytes(m)

    # tile geometry attacks (tags 322 TileWidth / 323 TileLength)
    for name, tw, th in (("tile_dims_zero", 0, 0),
                         ("tile_dims_huge", 0x40000, 0x40000),
                         ("tile_dims_one", 1, 1),
                         ("tile_dims_mismatch", TILE * 2, TILE)):
        m = bytearray(data)
        ok = (_patch_entry_value(m, ifds[0], 322, tw)
              and _patch_entry_value(m, ifds[0], 323, th))
        if ok:
            cases[name] = bytes(m)

    # corrupt abbreviated JPEGTables (tag 347): flip bytes inside the
    # shared quant/Huffman table stream
    e = _entry(data, ifds[0], 347)
    if e is not None and e[3] > 16:
        m = bytearray(data)
        off = e[4]  # count > 4 bytes -> value field is an offset
        for i in range(8, min(e[3], 64), 3):
            m[off + i] ^= 0xFF
        cases["bad_jpegtables"] = bytes(m)
        m = bytearray(data)
        struct.pack_into("<I", m, e[0] + 4, 4)  # tables count -> 4 (bogus)
        cases["short_jpegtables"] = bytes(m)

    # tile byte counts (tag 325): first tile claims 4 GB / zero bytes
    e = _entry(data, ifds[0], 325)
    if e is not None:
        for name, cnt in (("bytecount_huge", 0xFFFFFFF0),
                          ("bytecount_zero", 0)):
            m = bytearray(data)
            if e[3] == 1:
                struct.pack_into("<I", m, e[0] + 8, cnt)
            else:
                # LONG array lives at the offset; patch element 0
                struct.pack_into("<I", m, e[4], cnt)
            cases[name] = bytes(m)

    # tile offsets (tag 324): point tile 0 beyond EOF
    e = _entry(data, ifds[0], 324)
    if e is not None:
        m = bytearray(data)
        target = e[0] + 8 if e[3] == 1 else e[4]
        struct.pack_into("<I", m, target, 0x7FFFFFF0)
        cases["tile_offset_beyond_eof"] = bytes(m)

    # planar config says separate planes; data is contiguous clumps
    m = bytearray(data)
    if _patch_entry_value(m, ifds[0], 284, 2):
        cases["planar_separate_lie"] = bytes(m)

    # photometric lies (tag 262): claims RGB but tiles are JPEG YCbCr;
    # claims palette with no colormap
    for name, val in (("photometric_rgb_lie", 2),
                      ("photometric_palette_lie", 3)):
        m = bytearray(data)
        if _patch_entry_value(m, ifds[0], 262, val):
            cases[name] = bytes(m)

    # YCbCrSubSampling (tag 530): (3, 3) is not a legal JPEG factor combo
    e = _entry(data, ifds[0], 530)
    if e is not None:
        m = bytearray(data)
        struct.pack_into("<HH", m, e[0] + 8, 3, 3)
        cases["subsampling_3x3"] = bytes(m)

    # bits-per-sample 64 (tag 258, first value)
    e = _entry(data, ifds[0], 258)
    if e is not None:
        m = bytearray(data)
        target = e[0] + 8 if e[3] == 1 else e[4]
        struct.pack_into("<H", m, target, 64)
        cases["bps_64"] = bytes(m)

    # image dims lie: huge width with small tiles (tag 256/257), and a
    # declared ZERO-width image (division-by-zero bait in level math)
    m = bytearray(data)
    if (_patch_entry_value(m, ifds[0], 256, 0x7FFFFFFF)
            and _patch_entry_value(m, ifds[0], 257, 0x7FFFFFFF)):
        cases["image_dims_huge"] = bytes(m)
    m = bytearray(data)
    if (_patch_entry_value(m, ifds[0], 256, 0)
            and _patch_entry_value(m, ifds[0], 257, 0)):
        cases["image_dims_zero"] = bytes(m)

    # deterministic random bit flips all over the file
    for i in range(8):
        m = bytearray(data)
        fl = np.random.default_rng(100 + i)
        for pos in fl.integers(8, len(data), 16):
            m[pos] ^= 1 << int(fl.integers(0, 8))
        cases[f"bitflips_{i}"] = bytes(m)

    paths = {"valid": valid}
    for name, blob in cases.items():
        p = os.path.join(outdir, f"{name}.tiff")
        with open(p, "wb") as f:
            f.write(blob)
        paths[name] = p
    return paths


# ---------------------------------------------------------------------------

def exercise_one(path: str) -> str:
    """Open + drive every reader surface on one file.  Returns an outcome
    label; raises nothing (all Python-level failures are outcomes — only a
    native crash can escape, as process death)."""
    from sequoia_tpu import native

    try:
        r = native.NativeTiffReader(path)
    except OSError:
        return "open_refused"
    except Exception as e:  # noqa: BLE001 — unexpected but non-fatal
        return f"open_error:{type(e).__name__}"
    try:
        outcomes = []
        try:
            img = r.read_region((0, 0), 0, (TILE * 2, TILE * 2))
            outcomes.append("read_ok" if img.shape == (TILE * 2, TILE * 2, 3)
                            else "read_bad_shape")
        except OSError:
            outcomes.append("read_refused")
        except Exception as e:  # noqa: BLE001 — an unexpected TYPE is
            # itself a finding (the reader contract is OSError), but it
            # must surface as a labeled outcome, never kill the runner
            outcomes.append(f"read_error:{type(e).__name__}")
        try:
            coords = [(0, 0), (TILE, 0), (0, TILE), (SIDE - TILE, SIDE - TILE)]
            r.read_regions(coords, 0, (TILE, TILE), nthreads=4)
            outcomes.append("batch_ok")
        except OSError:
            outcomes.append("batch_refused")
        except Exception as e:  # noqa: BLE001
            outcomes.append(f"batch_error:{type(e).__name__}")
        try:
            r.tile_dims(0)
            sub = r.ycbcr_subsampling(0, (TILE, TILE))
        except Exception as e:  # noqa: BLE001
            outcomes.append(f"probe_error:{type(e).__name__}")
            sub = None
        if sub is not None:
            try:
                r.read_regions_ycbcr([(0, 0), (TILE, TILE)], 0, (TILE, TILE),
                                     nthreads=2)
                outcomes.append("ycbcr_ok")
            except OSError:
                outcomes.append("ycbcr_refused")
            except Exception as e:  # noqa: BLE001
                outcomes.append(f"ycbcr_error:{type(e).__name__}")
        return ",".join(outcomes)
    finally:
        r.close()


def run_corpus(corpus_dir: str) -> dict[str, str]:
    results = {}
    for name in sorted(os.listdir(corpus_dir)):
        if not name.endswith(".tiff"):
            continue
        results[name[:-5]] = exercise_one(os.path.join(corpus_dir, name))
    return results


def main(argv: list[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("corpus_dir")
    ap.add_argument("--build", action="store_true",
                    help="fabricate the corpus before running it")
    ap.add_argument("--lib", default=None,
                    help="alternate native .so (e.g. the asan build)")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sequoia_tpu import native

    if args.lib:
        native._LIB_PATH = os.path.abspath(args.lib)  # before first get_lib
    if args.build:
        build_corpus(args.corpus_dir)
    results = run_corpus(args.corpus_dir)
    print(json.dumps(results, indent=0, sort_keys=True))
    # reaching this line at all means no crash; the valid fixture must
    # still fully work (guards against over-hardening)
    ok = results.get("valid", "")
    if "read_ok" not in ok or "batch_ok" not in ok or "ycbcr_ok" not in ok:
        print(f"valid fixture degraded: {ok}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
