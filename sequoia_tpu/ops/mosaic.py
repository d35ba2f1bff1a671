"""Patch assembly from whole raw-YCbCr tiles — the "mosaic" serving path.

Real Aperio SVS slides store 240px JPEG tiles while the pipeline's patches
are 256px (reference ``pre_processing/patch_gen_hdf5.py:86-89`` reads 256px
regions through OpenSlide), so the per-patch raw-YCbCr fast path (tile dims
== patch size, ``serve.iter_raw_ycbcr_chunks``) never fires on the real
layout.  Two costs follow on real slides:

* libtiff JPEG-decodes every tile a patch touches per ``read_region`` — at
  240px tiles vs a 256px patch grid each tile is re-decoded ~3.7x on
  average (a 256px window spans E[(1 + 255/240)]^2 ~= 4.25 tiles; the grid
  has only ~1.14 tiles per patch).
* the decoded patches cross host->device as 3 B/px RGB.

This module fixes both by making the TILE the unit of decode and transfer:
the host groups the (shuffle-ordered, reference ``patch_gen_hdf5.py:100``)
candidate coords into spatial blocks, reads each block's unique tiles ONCE
as raw subsampled planes (1.5 B/px at 4:2:0), and a jitted device program
reconstructs whole tiles (per-tile libjpeg-bit-exact chroma upsampling —
tile-independent edge clamping is exactly libjpeg's, since each TIFF tile
is an independent JPEG image) then assembles every patch by a tile-stack
gather + ``lax.dynamic_slice``.  Pixels beyond the level bounds are masked
to the RGB path's zero fill, so assembled patches are BIT-EXACT vs
``read_region``.

Split of labor:

* :func:`plan_chunks` (host, pure) — spatial blocking, tile dedup, slot
  assignment under a fixed tile budget (static shapes for jit).
* :func:`make_assemble` (device) — the jittable assembly program; callers
  compose it with the fused screen+featurize program so candidate pixels
  cross host->device once, as raw planes.

Ordering contract: chunks arrive in spatial order, but each patch carries
its position in the original shuffle-ordered candidate list (``orig``);
the consumer restores shuffle order before applying the ``max_patches``
cap, so the kept set is IDENTICAL to the reference's shuffle-order cap
(``patch_gen_hdf5.py:100-123``).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from sequoia_tpu.ops import ycbcr


class MosaicChunk(NamedTuple):
    """One device launch group: ``tiles`` to read + patch assembly plan.

    tiles: (T, 2) int64 — (tx, ty) tile-grid indices to read raw (T <= the
        planner's tile budget; the producer pads the decoded stack to the
        static ``budget + 1`` slots, slot ``budget`` being the neutral tile).
    idx:   (P, ky*kx) int32 — tile-stack slot per neighborhood cell,
        row-major (dy, dx); out-of-grid cells point at the neutral slot.
    offs:  (P, 2) int32 — (row, col) of the patch inside its assembled
        ky*th x kx*tw neighborhood.
    wh:    (P, 2) int32 — in-bounds (width, height) of the patch; pixels
        beyond are masked to 0 (the RGB path's fill for edge reads).
    orig:  (P,) int64 — position of each patch in the shuffle-ordered
        candidate list (restores reference cap semantics downstream).
    """

    tiles: np.ndarray
    idx: np.ndarray
    offs: np.ndarray
    wh: np.ndarray
    orig: np.ndarray


def neighborhood(coords: Sequence[tuple[int, int]], ps: int,
                 tw: int, th: int) -> tuple[int, int]:
    """(ky, kx): tile rows/cols a ps-window spans, maxed over the actual
    candidate offsets (tile-aligned grids span exactly 1 even when a
    worst-case offset would span 2)."""
    kx = ky = 1
    for x, y in coords:
        kx = max(kx, (x % tw + ps - 1) // tw + 1)
        ky = max(ky, (y % th + ps - 1) // th + 1)
    return ky, kx


def block_tile_capacity(block: int, ps: int, tw: int, th: int) -> int:
    """Max unique tiles one block x block patch group can reference."""
    nx = (block * ps - 1 + tw - 1) // tw + 1
    ny = (block * ps - 1 + th - 1) // th + 1
    return nx * ny


def plan_chunks(coords: Sequence[tuple[int, int]], ps: int,
                tile: tuple[int, int], level_dims: tuple[int, int],
                tile_budget: int = 512, block: int = 8,
                ) -> Iterator[MosaicChunk]:
    """Group shuffle-ordered candidate coords into spatial chunks.

    Candidates are bucketed into ``block x block``-patch spatial blocks
    (row-major), then consecutive blocks are greedily merged into one chunk
    while the union of their tile neighborhoods fits ``tile_budget`` —
    merging dedups the tile rows/columns adjacent blocks share, so each
    tile is decoded and uploaded ~once per slide instead of ~3.7x (the
    per-patch RGB path's overlap amplification at 240px tiles).
    """
    if not coords:
        return
    tw, th = tile
    w0, h0 = level_dims
    ntx = (w0 + tw - 1) // tw
    nty = (h0 + th - 1) // th
    ky, kx = neighborhood(coords, ps, tw, th)
    tile_budget = max(tile_budget, block_tile_capacity(block, ps, tw, th))

    blocks: dict[tuple[int, int], list[int]] = {}
    for i, (x, y) in enumerate(coords):
        blocks.setdefault((y // (block * ps), x // (block * ps)), []).append(i)

    def patch_rows(members: list[int], slots: dict[tuple[int, int], int]):
        neutral = tile_budget  # static padding slot (black tile)
        for i in members:
            x, y = coords[i]
            tx0, ty0 = x // tw, y // th
            row = [slots[(tx0 + dx, ty0 + dy)]
                   if (tx0 + dx < ntx and ty0 + dy < nty) else neutral
                   for dy in range(ky) for dx in range(kx)]
            yield (i, row, (y % th, x % tw),
                   (max(0, min(ps, w0 - x)), max(0, min(ps, h0 - y))))

    def emit(slots, members):
        rows = list(patch_rows(members, slots))
        tiles = np.asarray(list(slots), np.int64)  # dict preserves order
        return MosaicChunk(
            tiles=tiles,
            idx=np.asarray([r[1] for r in rows], np.int32),
            offs=np.asarray([r[2] for r in rows], np.int32),
            wh=np.asarray([r[3] for r in rows], np.int32),
            orig=np.asarray([r[0] for r in rows], np.int64))

    slots: dict[tuple[int, int], int] = {}
    members: list[int] = []
    for key in sorted(blocks):
        btiles: set[tuple[int, int]] = set()
        for i in blocks[key]:
            x, y = coords[i]
            tx0, ty0 = x // tw, y // th
            btiles.update((tx0 + dx, ty0 + dy)
                          for dy in range(ky) for dx in range(kx)
                          if tx0 + dx < ntx and ty0 + dy < nty)
        fresh = sorted(t for t in btiles if t not in slots)
        if members and len(slots) + len(fresh) > tile_budget:
            yield emit(slots, members)
            slots, members = {}, []
            fresh = sorted(btiles)
        for t in fresh:
            slots[t] = len(slots)
        members.extend(blocks[key])
    if members:
        yield emit(slots, members)


def neutral_planar(tw: int, th: int, sh: int, sv: int) -> np.ndarray:
    """One planar tile that reconstructs to RGB(0,0,0): Y=0, Cb=Cr=128."""
    ny, nc = ycbcr.planar_sizes(th, tw, sh, sv)
    row = np.full(ny + 2 * nc, 128, np.uint8)
    row[:ny] = 0
    return row


def make_assemble(ps: int, tw: int, th: int, sh: int, sv: int,
                  ky: int, kx: int):
    """Jittable (stack, idx, offs, wh) -> (B, ps, ps, 3) uint8 assembly.

    ``stack`` is (U, planar_bytes) raw planes (U static = budget + 1, last
    slot neutral).  Tiles are reconstructed ONCE (libjpeg-bit-exact,
    ``ops/ycbcr.py``), then each patch gathers its ky*kx neighborhood and
    dynamic-slices its window; out-of-bounds pixels mask to zero.  All
    copies/elementwise — XLA fuses the reconstruction into the gather
    consumers; callers chain the output straight into the fused
    screen+featurize program so it never leaves the device.
    """
    kk = ky * kx

    def assemble(stack, idx, offs, wh):
        tiles = ycbcr.planar_to_rgb(stack, th, tw, sh, sv)  # (U, th, tw, 3)

        def one(args):
            ix, off = args  # (kk,), (2,)
            nb = jnp.take(tiles, ix, axis=0)  # (kk, th, tw, 3)
            nb = nb.reshape(ky, kx, th, tw, 3)
            nb = nb.transpose(0, 2, 1, 3, 4).reshape(ky * th, kx * tw, 3)
            return jax.lax.dynamic_slice(
                nb, (off[0], off[1], jnp.int32(0)), (ps, ps, 3))

        # lax.map bounds the (B, kk, th, tw, 3) gather intermediate to
        # 32-patch slabs (~50 MB at 240px tiles) instead of materializing
        # the full batch's neighborhoods
        patches = jax.lax.map(one, (idx, offs),
                              batch_size=min(32, idx.shape[0]))
        return ycbcr.mask_to_valid(patches, wh)

    return assemble
