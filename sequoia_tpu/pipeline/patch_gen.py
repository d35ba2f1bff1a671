"""Stage 1 — tiling: WSI -> patches HDF5 + tissue mask.

On-disk contract (reference ``pre_processing/patch_gen_hdf5.py:51-133``):
``{patch_path}/{slide_id}/{slide_id}.hdf5`` with one uint8 (ps, ps, 3)
dataset per kept tile named ``"{x}_{y}"`` (level-0 coordinates),
``{mask_path}/{slide_id}/mask.npy`` (the [x, y]-indexed low-res tissue
mask), and a ``complete.txt`` sentinel for idempotent re-runs.

Behavior contract reproduced exactly:
* mask from the lowest pyramid level, Otsu HSV-S AND NOT(RGB background)
  AND RGB>50, dilated+eroded 3 iterations;
* magnification handling: ``patch_size_resized = AppMag/20 * patch_size``;
* candidate grid stepping ``patch_size_resized[0]`` in BOTH axes (reference
  quirk, ``patch_gen_hdf5.py`` grid build), shuffled with
  ``np.random.seed(5)``;
* keep: coarse-mask hit, per-patch dilated tissue mask > 20%, not
  low-contrast; resize back to ``patch_size`` when magnification != 20;
* stop at ``max_patches_per_slide``.

TPU-first: candidate patches are screened in device batches
(``ops.masking.patch_keep_flags``) — the per-patch Otsu/morphology that
dominates the reference's Python loop runs as one fused XLA program per
chunk.  Host decode stays the IO boundary.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

import jax.numpy as jnp

from sequoia_tpu.data.wsi import SlideReader, open_slide
from sequoia_tpu.ops import masking

BACKGROUND_THRESHOLD = 0.2


def compute_slide_mask(slide: SlideReader, level: str | int = "max"):
    """Low-res tissue mask in the reference's [x, y] layout."""
    if level == "max":
        level = len(slide.level_dimensions) - 1
    w, h = slide.level_dimensions[level]
    img = slide.read_region((0, 0), level, (w, h))  # (h, w, 3)
    img_xy = np.transpose(img, (1, 0, 2))  # reference transposes to [x, y]
    mask = np.asarray(masking.tissue_mask(jnp.asarray(img_xy)))
    mask = np.asarray(masking.binary_dilation(jnp.asarray(mask), iterations=3))
    mask = np.asarray(masking.binary_erosion(jnp.asarray(mask), iterations=3))
    return mask, level


def candidate_grid(xmax: int, ymax: int, step: int, seed: int = 5):
    """Reference candidate enumeration + seeded shuffle (np.random.seed(5))."""
    indices = [(x, y) for x in range(0, xmax, step) for y in range(0, ymax, step)]
    np.random.seed(seed)
    np.random.shuffle(indices)
    return indices


def resize_factor(slide) -> float:
    """AppMag -> level-0 resize factor (reference ``patch_gen_hdf5.py:86-89``:
    patches are read at AppMag/20 x the target size, then resized down)."""
    return float(slide.properties.get("aperio.AppMag", 20) or 20) / 20.0


def masked_candidates(slide, mask: np.ndarray, mask_level,
                      patch_size: int):
    """Level-0 candidate coords passing the slide-level tissue mask ->
    ``(coords, patch_size_resized, resize_factor)``.

    The coarse-screen enumeration shared by the tiling stage and serving —
    one implementation so the grid/mask-ratio/AppMag semantics cannot
    drift between offline features and served predictions."""
    ratio_x = slide.level_dimensions[0][0] / slide.level_dimensions[mask_level][0]
    ratio_y = slide.level_dimensions[0][1] / slide.level_dimensions[mask_level][1]
    xmax, ymax = slide.level_dimensions[0]
    rf = resize_factor(slide)
    psr = int(rf * patch_size)
    coords = []
    for x, y in candidate_grid(xmax, ymax, psr):
        xm, ym = int(x / ratio_x), int(y / ratio_y)
        if xm < mask.shape[0] and ym < mask.shape[1] and mask[xm, ym]:
            coords.append((x, y))
    return coords, psr, rf


def extract_patches(slide_path, patches_output_dir: str, mask_path: str,
                    slide_id: str, patch_size: tuple[int, int] = (256, 256),
                    max_patches_per_slide: int | None = None,
                    screen_batch: int = 64, verbose: bool = True,
                    layout: str = "tiles") -> int:
    """Tile one slide.  Returns the number of patches written.

    ``layout='tiles'`` (default) writes the reference contract: one HDF5
    dataset per tile named ``"{x}_{y}"``.  ``layout='packed'`` writes one
    chunked uint8 ``patches`` (N, ps, ps, 3) dataset + an int64 ``coords``
    (N, 2) dataset — ~2 h5py objects instead of ~4000, which removes the
    per-dataset metadata cost on both write and read; every reader in this
    package (``pipeline/features.load_patches``) handles both layouts.
    """
    patch_folder = os.path.join(patches_output_dir, slide_id)
    os.makedirs(patch_folder, exist_ok=True)
    patch_folder_mask = os.path.join(mask_path, slide_id)
    os.makedirs(patch_folder_mask, exist_ok=True)

    if os.path.exists(os.path.join(patch_folder, "complete.txt")):
        if verbose:
            print(f"{slide_id}: patches have already been extracted")
        return -1

    slide = open_slide(slide_path)
    mask, mask_level = compute_slide_mask(slide)
    np.save(os.path.join(patch_folder_mask, "mask.npy"), mask)

    indices, psr_x, rf = masked_candidates(slide, mask, mask_level,
                                           patch_size[0])
    psr = (psr_x, int(rf * patch_size[1]))  # x-axis from the shared helper
    if verbose:
        print(f"patch size for {slide_id}: {psr}")

    if max_patches_per_slide is None:
        max_patches_per_slide = len(indices)

    if layout not in ("tiles", "packed"):
        raise ValueError(f"layout must be 'tiles' or 'packed', got {layout!r}")
    n_written = 0
    path_hdf5 = os.path.join(patch_folder, f"{slide_id}.hdf5")
    with h5py.File(path_hdf5, "w") as hdf:
        if layout == "packed":
            packed = hdf.create_dataset(
                "patches", shape=(0, *patch_size, 3),
                maxshape=(None, *patch_size, 3), dtype=np.uint8,
                chunks=(min(64, max_patches_per_slide or 64), *patch_size, 3))
            packed_xy = hdf.create_dataset(
                "coords", shape=(0, 2), maxshape=(None, 2), dtype=np.int64)
        pend_imgs: list[np.ndarray] = []
        pend_xy: list[tuple[int, int]] = []

        def write(imgs: list[np.ndarray], xys: list[tuple[int, int]]):
            nonlocal n_written
            if layout == "tiles":
                for img, (x, y) in zip(imgs, xys):
                    hdf.create_dataset(f"{x}_{y}", data=img)
            else:
                n0 = n_written
                packed.resize(n0 + len(imgs), axis=0)
                packed_xy.resize(n0 + len(imgs), axis=0)
                packed[n0:] = np.stack(imgs)
                packed_xy[n0:] = np.asarray(xys, np.int64)
            n_written += len(imgs)

        def flush():
            if not pend_imgs or n_written >= max_patches_per_slide:
                pend_imgs.clear()
                pend_xy.clear()
                return
            batch = jnp.asarray(np.stack(pend_imgs))
            keep = np.asarray(masking.patch_keep_flags(
                batch, background_threshold=BACKGROUND_THRESHOLD))
            out_imgs, out_xy = [], []
            for img, (x, y), k in zip(pend_imgs, pend_xy, keep):
                if n_written + len(out_imgs) >= max_patches_per_slide:
                    break
                if not k:
                    continue
                if rf != 1.0:
                    from PIL import Image

                    img = np.asarray(Image.fromarray(img).resize(patch_size))
                out_imgs.append(img)
                out_xy.append((x, y))
            if out_imgs:
                write(out_imgs, out_xy)
            pend_imgs.clear()
            pend_xy.clear()

        from sequoia_tpu.data.wsi import read_regions

        pend_coords: list[tuple[int, int]] = []

        def decode_and_flush():
            nonlocal pend_imgs, pend_xy
            if pend_coords:
                # parallel decode (native thread pool when available)
                imgs = read_regions(slide, pend_coords, 0, psr)
                pend_imgs = list(imgs)
                pend_xy = list(pend_coords)
                pend_coords.clear()
            flush()

        for x, y in indices:  # already slide-mask screened
            if n_written >= max_patches_per_slide:
                break
            pend_coords.append((x, y))
            if len(pend_coords) == screen_batch:
                decode_and_flush()
        if n_written < max_patches_per_slide:
            # cap already hit: decoding the pending tail (up to
            # screen_batch-1 full-res regions) would be discarded anyway
            decode_and_flush()

    if n_written == 0:
        if verbose:
            print(f"no patch extracted for slide {slide_id}")
    else:
        with open(os.path.join(patch_folder, "complete.txt"), "w") as f:
            f.write("Process complete!\n")
            f.write(f"Total n patch = {n_written}")
        if verbose:
            print(f"{slide_id} complete, total n patch = {n_written}")
    return n_written


def run_patch_gen(slide_paths: dict[str, str], patch_path: str, mask_path: str,
                  patch_size: int = 256, max_patches_per_slide: int | None = None,
                  verbose: bool = True, layout: str = "tiles") -> None:
    """Tile a set of slides: {slide_id: path}."""
    for slide_id, path in slide_paths.items():
        try:
            extract_patches(path, patch_path, mask_path, slide_id,
                            (patch_size, patch_size), max_patches_per_slide,
                            verbose=verbose, layout=layout)
        except Exception as e:  # per-slide quarantine (reference behavior)
            print(f"error with slide id {slide_id}: {e}")
