"""Stage 8 — spatial expression maps via sliding windows.

Behavior contract (reference ``spatial_vis/visualize.py:35-102,185-205``): build the valid
tile grid from the saved ``mask.npy`` (>=50% tissue per tile after
3-iteration dilation), slide a ``10x10``-tile window at ``stride`` over the
rescaled grid; windows holding more than 50 tiles are featurized, zero-padded
to 100 tokens, and run through the fold model; every member tile receives the
window's gene predictions, and overlapping windows average (stride < 10).
Output: ``stride-{stride}.csv`` with ``xcoord, ycoord, xcoord_tf, ycoord_tf``
plus ``{gene}_{fold}`` columns and the across-fold mean ``{gene}`` column.

TPU-first redesign: the reference re-reads and re-featurizes every tile for
EVERY window that contains it (up to 100x redundant backbone work at
stride 1 — SURVEY.md section 3.5).  Here each valid tile is featurized ONCE
(batched uint8 -> backbone), and windows become gathers over the cached
feature table batched through the aggregator.  Token order inside a window
(the df row order = column-major over (x, y)) and the zero-padding rule are
preserved exactly, so outputs match the reference tile-for-tile.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from scipy.ndimage import binary_dilation as _sp_dilate

import jax
import jax.numpy as jnp

BACKGROUND_THRESHOLD = 0.5


def build_valid_tiles(mask_xy: np.ndarray, slide_dims: tuple[int, int],
                      patch_size_resized: int) -> pd.DataFrame:
    """Valid-tile DataFrame (reference visualize.py grid build).

    ``mask_xy``: the stage-1 ``mask.npy`` ([x, y] layout); ``slide_dims``:
    level-0 (width, height).
    """
    w, h = slide_dims
    downsample = int(w / mask_xy.shape[0])
    ps_in_mask = int(patch_size_resized / downsample)
    mask_rc = (np.transpose(mask_xy, (1, 0)) * 1)  # [row, col]

    valid = []
    for col in range(0, w - patch_size_resized, patch_size_resized):
        for row in range(0, h - patch_size_resized, patch_size_resized):
            rd, cd = int(row / downsample), int(col / downsample)
            sub = mask_rc[rd:rd + ps_in_mask, cd:cd + ps_in_mask]
            if sub.size == 0:
                # truncated downsample factor can map edge tiles past the
                # mask; the reference COUNTS these as valid (its
                # `sum() >= 0.5 * 0` check is true on an empty crop)
                valid.append((col, row))
                continue
            sub = _sp_dilate(sub, iterations=3)
            if sub.sum() >= BACKGROUND_THRESHOLD * sub.size:
                valid.append((col, row))

    df = pd.DataFrame(valid, columns=["xcoord", "ycoord"])
    df["xcoord_tf"] = ((df["xcoord"] - df["xcoord"].min())
                       / patch_size_resized).astype(int)
    df["ycoord_tf"] = ((df["ycoord"] - df["ycoord"].min())
                       / patch_size_resized).astype(int)
    return df


def featurize_tiles(slide, df: pd.DataFrame, patch_size_resized: int,
                    extractor, resize_to: int | None = None,
                    decode_chunk: int = 512) -> np.ndarray:
    """Read + featurize every valid tile ONCE -> (n_tiles, D).

    Decodes in parallel chunks (native thread pool when available) and
    streams them through the batched extractor.
    """
    from sequoia_tpu.data.wsi import read_regions
    from sequoia_tpu.ops import pil_resize

    coords = [(int(r["xcoord"]), int(r["ycoord"])) for _, r in df.iterrows()]
    feats = []
    for start in range(0, len(coords), decode_chunk):
        chunk = coords[start:start + decode_chunk]
        tiles = read_regions(slide, chunk, 0,
                             (patch_size_resized, patch_size_resized))
        if resize_to and tiles.shape[1] != resize_to:
            # the reference applies transforms.Resize on a PIL image =
            # Pillow BILINEAR + antialias (visualize.py:212,227);
            # pil_resize reproduces it bit-exactly on device.  Pad the
            # tail chunk so only one shape is ever compiled.
            n = tiles.shape[0]
            if n < decode_chunk:
                pad = np.zeros((decode_chunk - n,) + tiles.shape[1:], np.uint8)
                tiles = np.concatenate([tiles, pad])
            tiles = np.asarray(pil_resize.resize_u8(tiles, resize_to,
                                                    resize_to))[:n]
        feats.append(extractor(tiles))
    return np.concatenate(feats, axis=0)


def collect_windows(df: pd.DataFrame, *, stride: int = 1, window: int = 10):
    """Qualifying-window member lists (reference order: df rows are already
    sorted column-major, matching ``window.index``)."""
    xtf = df["xcoord_tf"].to_numpy()
    ytf = df["ycoord_tf"].to_numpy()
    max_x, max_y = int(xtf.max()), int(ytf.max())
    min_tiles = (window * window) / 2
    windows: list[np.ndarray] = []
    for x in range(0, max_x, stride):
        for y in range(0, max_y, stride):
            sel = np.nonzero((xtf >= x) & (xtf < x + window)
                             & (ytf >= y) & (ytf < y + window))[0]
            if sel.shape[0] > min_tiles:
                windows.append(sel)
    return windows


def _sliding_window_device(tile_feats, windows, multi_fn, gene_indices,
                           n, dim, *, num_tokens: int, batch_windows: int,
                           _device_sums: bool = False, mesh=None):
    """Device-resident window stage (``accumulate='device'``): the (n, D)
    feature table crosses host->device ONCE; per chunk a jitted gather
    assembles (W, num_tokens, D) windows from padded index rows, the
    stacked fold forward produces (F, W, G) on device, and a jitted
    scatter-add accumulates per-tile sums in an (n, G_sel) f32 buffer per
    fold (donated across chunks).  Pad index = n selects the table's
    appended zero row on gather and is dropped (``mode='drop'``) on
    scatter, so partial windows and partial tail chunks need no host-side
    special-casing.

    ``mesh``: a ('data','model') Mesh shards the stage — window batches
    over 'data' (the table replicates; every window gathers arbitrary
    rows), fold gene heads over 'model' when ``multi_fn`` was built with
    the same mesh, and overlap averaging becomes one-hot GEMMs whose
    window-axis reduction carries the cross-shard psum (same layout the
    multichip dryrun certifies, ``__graft_entry__._dryrun_spatial``)."""
    fold_keys = list(multi_fn.fold_keys)
    g_all = np.arange(len(gene_indices))
    # "selection is the identity" needs the model's G, discovered from the
    # first chunk's forward: indices 0..k-1 into a WIDER head still select
    full_width = None

    table = jnp.concatenate([jnp.asarray(tile_feats, jnp.float32),
                             jnp.zeros((1, dim), jnp.float32)])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        table = jax.device_put(table, NamedSharding(mesh, P()))
        batch_windows = -(-batch_windows // mesh.shape["data"]) \
            * mesh.shape["data"]

        def _upload_idx(idx):
            return jax.device_put(jnp.asarray(idx),
                                  NamedSharding(mesh, P("data")))
    else:
        _upload_idx = jnp.asarray
    gather = jax.jit(lambda t, i: t[i])
    gene_idx_dev = jnp.asarray(gene_indices)

    @jax.jit
    def select_genes(preds):  # (F, W, G) -> (F, W, G_sel)
        return preds[:, :, gene_idx_dev]

    from functools import partial

    if mesh is None:
        @partial(jax.jit, donate_argnums=0)
        def scatter_add(sums, preds, idx):
            # sums (n, G_sel) f32; preds (W, G_sel); idx (W, K) pad = n
            def body(i, s):
                return s.at[idx[i]].add(preds[i], mode="drop")

            return jax.lax.fori_loop(0, preds.shape[0], body, sums)
    else:
        @partial(jax.jit, donate_argnums=0)
        def scatter_add(sums, preds, idx):
            # sharded: member matrix as a one-hot GEMM whose window-axis
            # reduction carries the cross-'data' psum (a sequential
            # fori_loop over a sharded W would serialize the mesh); the
            # pad index n lands in a dropped extra row
            member = jnp.sum(jax.nn.one_hot(idx, n + 1, dtype=jnp.float32),
                             axis=1)                       # (W, n+1)
            return sums + jnp.einsum("wn,wg->ng", member, preds)[:n]

    sums_dev = {f: jnp.zeros((n, len(gene_indices)), jnp.float32)
                for f in fold_keys}
    counts = np.zeros(n, np.int64)

    for start in range(0, len(windows), batch_windows):
        chunk = windows[start:start + batch_windows]
        # gather indices: first num_tokens members (the model's token
        # budget); scatter indices: EVERY member tile receives the window
        # prediction (reference visualize.py:87-100) — identical matrices
        # at window <= sqrt(num_tokens), kept separate for larger windows
        k_scatter = max(num_tokens, max(len(s) for s in chunk))
        gidx = np.full((batch_windows, num_tokens), n, np.int32)
        sidx = np.full((batch_windows, k_scatter), n, np.int32)
        for i, sel in enumerate(chunk):
            gidx[i, : min(len(sel), num_tokens)] = sel[:num_tokens]
            sidx[i, : len(sel)] = sel
        np.add.at(counts, np.concatenate(chunk), 1)

        feats_dev = gather(table, _upload_idx(gidx))
        preds = multi_fn.raw_fwd(feats_dev)  # (F, W, G) on device
        if full_width is None:
            full_width = preds.shape[2] == len(gene_indices) and bool(
                np.array_equal(gene_indices, g_all))
        if not full_width:
            preds = select_genes(preds)
        sidx_dev = _upload_idx(sidx)
        for fi, f in enumerate(fold_keys):
            sums_dev[f] = scatter_add(sums_dev[f], preds[fi], sidx_dev)

    if _device_sums:
        # benchmarking hook: hand back the on-device sum buffers + counts
        # so the caller can sync without a (F, n, G) host readback (the
        # sandbox relay makes that download ~100x slower than production
        # PCIe; the compute being timed is identical)
        return fold_keys, sums_dev, counts

    seen = counts > 0
    means = {}
    for f in fold_keys:
        m = np.full((n, len(gene_indices)), np.nan)
        s = np.asarray(sums_dev[f])  # ONE download per fold
        m[seen] = s[seen] / counts[seen, None]
        means[f] = m
    return fold_keys, means, seen


def sliding_window_predict_arrays(tile_feats: np.ndarray, df: pd.DataFrame,
                                  predict_fns, gene_indices, *,
                                  stride: int = 1, window: int = 10,
                                  num_tokens: int = 100,
                                  batch_windows: int = 64,
                                  accumulate: str = "auto",
                                  _device_sums: bool = False, mesh=None):
    """Reference ``sliding_window_method`` over cached features, all folds
    in one pass: windows are gathered/padded ONCE and every fold's model
    runs on the same device batch.

    ``mesh``: optional ('data','model') Mesh — the device accumulate path
    shards window batches over 'data' (and the fold heads over 'model'
    when the stacked predictor was built with the same mesh); implies
    ``accumulate='device'``.

    ``predict_fns``: {fold: (W, num_tokens, D) -> (W, G)} callables, or a
    single STACKED predictor (from :func:`make_vis_stacked_predict_fn`)
    mapping (W, num_tokens, D) -> {fold: (W, G)} in one vmapped forward.

    ``accumulate``: where the overlap-averaging sums live.

    * ``"host"`` — float64 numpy accumulation (bit-faithful to the
      reference's per-tile list means; the parity gates run this).
    * ``"device"`` — the whole window stage stays on device: the feature
      table uploads ONCE, window gather / fold forwards / overlap
      scatter-add all run as jitted XLA programs, and only the final
      (n_tiles, G_sel) sums come back.  At ``--gene_names all`` this
      removes ~GBs of per-chunk host<->device traffic (the host path
      re-uploads every gathered window and downloads every (F, W, 20820)
      prediction block).  Sums are f32 on device; with <= (window/stride)^2
      ~= 100 overlapping terms per tile the result matches the host path
      to ~1e-5 relative.  Requires a stacked predictor
      (:func:`make_vis_stacked_predict_fn`).
    * ``"auto"`` — ``"device"`` when a stacked predictor is given AND the
      output is wide enough to matter (>= 1024 genes), else ``"host"``.

    Returns ``(fold_keys, means, seen)`` where ``means[f]`` is the
    (n_tiles, G_sel) overlap-averaged prediction table (NaN on never-covered
    tiles) — fully vectorized, so ``--gene_names all`` (20,820 genes) costs
    one segment-sum per chunk instead of the reference's per-window-per-gene
    Python scatter (``spatial_vis/visualize.py:87-100``).
    """
    n, dim = tile_feats.shape
    windows = collect_windows(df, stride=stride, window=window)
    gene_indices = np.asarray(list(gene_indices), np.int64)

    if callable(predict_fns):
        multi_fn = predict_fns
        # stacked predictors advertise their folds; otherwise discovered
        # from the first chunk
        fold_keys = list(getattr(predict_fns, "fold_keys", [])) or None
    else:
        def multi_fn(feats_dev):
            return {f: np.asarray(fn(feats_dev))
                    for f, fn in predict_fns.items()}

        fold_keys = list(predict_fns)

    raw_fwd = getattr(multi_fn, "raw_fwd", None)
    if accumulate not in ("auto", "host", "device"):
        raise ValueError(f"accumulate must be auto|host|device, "
                         f"got {accumulate!r}")
    if accumulate == "device" and raw_fwd is None:
        raise ValueError("accumulate='device' needs a stacked predictor "
                         "(make_vis_stacked_predict_fn)")
    if mesh is not None and raw_fwd is None:
        raise ValueError("mesh sharding needs a stacked predictor "
                         "(make_vis_stacked_predict_fn)")
    if accumulate == "auto":
        accumulate = ("device" if raw_fwd is not None
                      and (mesh is not None or len(gene_indices) >= 1024)
                      else "host")
    if mesh is not None and accumulate != "device":
        raise ValueError("mesh sharding requires accumulate='device'")
    if accumulate == "device":
        return _sliding_window_device(tile_feats, windows, multi_fn,
                                      gene_indices, n, dim,
                                      num_tokens=num_tokens,
                                      batch_windows=batch_windows,
                                      _device_sums=_device_sums, mesh=mesh)
    if _device_sums:
        raise ValueError("_device_sums requires accumulate='device'")

    # pre-init when folds are known so ZERO qualifying windows (sparse
    # biopsy: no 10x10 window holds >50 tiles) yields all-NaN tables like
    # the reference, instead of a KeyError on the empty sums dict
    sums: dict = ({f: np.zeros((n, len(gene_indices))) for f in fold_keys}
                  if fold_keys else {})
    counts = np.zeros(n, np.int64)

    for start in range(0, len(windows), batch_windows):
        chunk = windows[start:start + batch_windows]
        feats = np.zeros((batch_windows, num_tokens, dim), np.float32)
        for i, sel in enumerate(chunk):
            feats[i, : len(sel)] = tile_feats[sel[:num_tokens]]
        feats_dev = jnp.asarray(feats)  # one transfer for all folds
        member_tiles = np.concatenate(chunk) if chunk else np.zeros(0, np.int64)
        np.add.at(counts, member_tiles, 1)
        fold_preds = multi_fn(feats_dev)
        if not sums:
            fold_keys = list(fold_preds)
            sums = {f: np.zeros((n, len(gene_indices))) for f in fold_keys}
        for f in fold_keys:
            preds = np.asarray(fold_preds[f])  # (W, G)
            if not (len(gene_indices) == preds.shape[1]
                    and np.array_equal(gene_indices,
                                       np.arange(preds.shape[1]))):
                preds = preds[:, gene_indices]  # (W, G_sel)
            s = sums[f]
            # member indices are unique within a window, so fancy-index +=
            # is one vectorized row-add per window (np.add.at would scatter
            # element-wise: ~100x slower at 20,820 genes)
            for i, sel in enumerate(chunk):
                s[sel] += preds[i]

    seen = counts > 0
    means = {}
    for f in (fold_keys or []):
        m = np.full((n, len(gene_indices)), np.nan)
        m[seen] = sums[f][seen] / counts[seen, None]
        means[f] = m
    return list(fold_keys or []), means, seen


def sliding_window_predict_multi(tile_feats: np.ndarray, df: pd.DataFrame,
                                 predict_fns, gene_indices, *,
                                 stride: int = 1, window: int = 10,
                                 num_tokens: int = 100,
                                 batch_windows: int = 64,
                                 accumulate: str = "auto"):
    """Dict view of :func:`sliding_window_predict_arrays`:
    {fold: {gene_index: {df_row_label: prediction}}} (reference layout)."""
    labels = df.index.to_numpy()
    gene_indices = list(gene_indices)
    fold_keys, means, seen = sliding_window_predict_arrays(
        tile_feats, df, predict_fns, gene_indices, stride=stride,
        window=window, num_tokens=num_tokens, batch_windows=batch_windows,
        accumulate=accumulate)
    out = {}
    for f in fold_keys:
        m = means[f][seen]
        out[f] = {int(g): {int(lbl): float(v)
                           for lbl, v in zip(labels[seen], m[:, j])}
                  for j, g in enumerate(gene_indices)}
    return out


def sliding_window_predict(tile_feats: np.ndarray, df: pd.DataFrame,
                           predict_fn, gene_indices, *, stride: int = 1,
                           window: int = 10, num_tokens: int = 100,
                           batch_windows: int = 64) -> dict[int, dict[int, float]]:
    """Single-model variant of :func:`sliding_window_predict_multi`."""
    return sliding_window_predict_multi(
        tile_feats, df, {0: predict_fn}, gene_indices, stride=stride,
        window=window, num_tokens=num_tokens, batch_windows=batch_windows)[0]


def run_visualize(slide, mask_xy: np.ndarray, gene_ids: list[str],
                  fold_models: dict[int, callable], extractor, *,
                  gene_names=None, patch_size: int = 256,
                  resize_factor: float | None = None, stride: int = 1,
                  save_path: str | None = None,
                  resize_patch_to: int | None = None,
                  accumulate: str = "auto",
                  num_tokens: int = 100, mesh=None) -> pd.DataFrame:
    """Full per-slide flow (reference visualize.py __main__):

    ``fold_models``: {fold: predict_fn((W, num_tokens, D) -> (W, G))}.
    ``num_tokens``: the model's token budget (reference contract: 100;
    pass the checkpoint's ``num_clusters`` for non-contract models).
    Returns the result DataFrame (and writes ``stride-{stride}.csv``).
    """
    if resize_factor is None:
        resize_factor = float(slide.properties.get("aperio.AppMag", 20) or 20) / 20.0
    patch_size_resized = int(resize_factor * patch_size)

    df = build_valid_tiles(mask_xy, slide.dimensions, patch_size_resized)
    res_df = df.copy(deep=True)

    gene_names = list(gene_names) if gene_names is not None else list(gene_ids)
    gene_pos: dict = {}  # O(1) list.index equivalent: FIRST occurrence wins
    for i, g in enumerate(gene_ids):
        gene_pos.setdefault(g, i)
    inds = []
    for gname in gene_names:
        if gname in gene_pos:
            inds.append(gene_pos[gname])
        else:
            print(f"gene not in predicted values {gname}")

    tile_feats = featurize_tiles(slide, df, patch_size_resized, extractor,
                                 resize_to=resize_patch_to)

    fold_keys, means, _ = sliding_window_predict_arrays(
        tile_feats, df, fold_models, inds, stride=stride,
        num_tokens=num_tokens, accumulate=accumulate, mesh=mesh)
    folds = sorted(fold_keys)
    # Assemble all {gene}_{fold} + across-fold-mean columns in ONE concat —
    # per-column inserts fragment the frame and are Python-quadratic at
    # --gene_names all (20,820 genes x folds).
    blocks = [pd.DataFrame(means[fold],
                           columns=[f"{gene_ids[g]}_{fold}" for g in inds],
                           index=res_df.index)
              for fold in folds]
    # no folds resolved (zero qualifying windows on a bare-callable
    # predictor): the reference still writes the mean gene columns, NaN
    fold_mean = np.nanmean(np.stack([means[f] for f in folds]), axis=0) \
        if folds else np.full((len(res_df), len(inds)), np.nan)
    blocks.append(pd.DataFrame(fold_mean, columns=[gene_ids[g] for g in inds],
                               index=res_df.index))
    res_df = pd.concat([res_df] + blocks, axis=1)

    if save_path:
        os.makedirs(save_path, exist_ok=True)
        res_df.to_csv(os.path.join(save_path, f"stride-{stride}.csv"))
    return res_df


def make_vis_predict_fn(cfg, params):
    """Batched ViS/ViT forward for sliding windows."""
    from sequoia_tpu.models import vis as vis_mod

    fwd = jax.jit(lambda p, x: vis_mod.apply(cfg, p, x))
    return lambda feats: fwd(params, jnp.asarray(feats))


def make_vis_stacked_predict_fn(cfg, fold_params: dict, mesh=None):
    """All folds as ONE vmapped forward over stacked parameters:
    (W, 100, D) -> {fold: (W, G)} (for :func:`sliding_window_predict_multi`).

    ``mesh``: shard every fold's (D, G) gene head (and bias) over the
    'model' axis, the rest replicated — the layout the multichip dryrun's
    spatial leg certifies."""
    from sequoia_tpu.models import vis as vis_mod

    folds = sorted(fold_params)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[fold_params[f] for f in folds])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        specs = jax.tree.map(lambda _: P(), stacked)
        specs["head_w"] = P(None, None, "model")
        specs["head_b"] = P(None, "model")
        stacked = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            stacked, specs)
    fwd = jax.jit(jax.vmap(lambda p, x: vis_mod.apply(cfg, p, x),
                           in_axes=(0, None)))

    def multi(feats):
        out = np.asarray(fwd(stacked, jnp.asarray(feats)))  # (F, W, G)
        return {f: out[i] for i, f in enumerate(folds)}

    multi.fold_keys = folds  # known up front: zero-window slides still
    # get per-fold (all-NaN) columns like the reference
    multi.raw_fwd = lambda feats_dev: fwd(stacked, feats_dev)  # device
    # (F, W, G), no host round-trip — enables accumulate='device'
    return multi


def make_he2rna_predict_fn(cfg, params):
    """HE2RNA eval forward (k-averaged, NO ReLU — reference visualize.py
    uses raw model output)."""
    from sequoia_tpu.models import he2rna as he_mod

    fwd = jax.jit(lambda p, x: he_mod.apply(cfg, p, x, train=False))
    return lambda feats: fwd(params, jnp.asarray(feats))
