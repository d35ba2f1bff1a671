"""Stage 2 — feature extraction: patches HDF5 -> per-patch embeddings.

On-disk contract (reference ``pre_processing/compute_features_hdf5.py:99-139``):
``{feature_path}/{project}/{wsi}/{wsi}.h5`` with dataset
``{feat_type}_features`` of shape (N, 2048) for resnet / (N, 1024) for uni;
``complete_tile.txt`` sentinel after success, ``complete_resnet.txt``
honored as a skip marker; patch keys subsampled to ``max_patch_number`` with
``random.sample`` (the reference seeds the global ``random`` module with
``--seed``); per-slide try/except quarantine.

TPU-first: the reference pushes ONE patch at a time through the backbone
(batch size 1, two PCIe hops per 256x256 tile — its biggest inefficiency,
SURVEY.md section 3.3).  Here patches stream to the device as uint8 in fixed
``batch_size`` blocks; dtype conversion + ImageNet normalization (+ the
224-resize for UNI) are fused into the jitted backbone program, and a
double-buffer keeps host HDF5 reads ahead of device compute.
"""

from __future__ import annotations

import os
import random as pyrandom

import h5py
import numpy as np

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet as resnet_mod
from sequoia_tpu.models import uni_vit


class FeatureExtractor:
    """Jitted batched backbone with fused preprocessing.

    feat_type='resnet': normalize 256px uint8 -> ResNet-50 -> 2048-d.
    feat_type='uni': resize to 224 (bit-exact Pillow BILINEAR on the MXU,
    the reference's PIL ``Resize(224)``) -> ViT-L/16 -> 1024-d.
    """

    #: ViT-L runs ~30% faster in small sub-batches (the (bs, 197, 4096) MLP
    #: activation tiles much better; live v5e sweep r3: 949 p/s at 16 vs
    #: 726 at 128), so the uni forward scans the upload batch in chunks of
    #: this size INSIDE the jitted program — upload granularity (and the
    #: fused serve program's shape) stays ``batch_size``.
    UNI_SCAN_CHUNK = 16

    def __init__(self, feat_type: str, params, batch_size: int = 256,
                 compute_dtype=None, patch_size: int = 256,
                 cfg=None, mesh=None):
        self.feat_type = feat_type
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.mesh = mesh
        if mesh is not None:
            # data-parallel extraction over ICI: patch batches shard over
            # the mesh's 'data' axis, backbone params replicate.  The
            # backbone has no cross-example mixing, so each chip computes
            # its shard independently — no collectives until aggregation.
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if batch_size % n_data:
                raise ValueError(f"batch_size {batch_size} not divisible by "
                                 f"mesh data axis {n_data}")
            self._in_shard = NamedSharding(mesh, P("data"))
            params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            self._in_shard = None
        self.params = params
        if (cfg is not None and compute_dtype is not None
                and cfg.compute_dtype != compute_dtype):
            raise ValueError(
                f"cfg.compute_dtype={cfg.compute_dtype} conflicts with "
                f"compute_dtype={compute_dtype}; set it on the cfg")
        compute_dtype = compute_dtype if compute_dtype is not None else jnp.float32

        if feat_type == "resnet":
            cfg = cfg or resnet_mod.ResNetConfig(compute_dtype=compute_dtype)
            # AvgPool2d(7) flattening: >=448px patches yield C*nh*nw
            # features (reference x.view(B, -1)), not a fixed 2048
            self.feature_dim = cfg.feature_dim_for(patch_size, patch_size)

            def fwd(params, u8):
                return resnet_mod.extract_from_uint8(cfg, params, u8)
        elif feat_type == "uni":
            cfg = cfg or uni_vit.UniViTConfig(compute_dtype=compute_dtype)
            self.feature_dim = cfg.dim

            def one_chunk(params, u8):
                # reference order (compute_features_hdf5.py:53-56): PIL
                # Resize(224) then ToTensor+Normalize — the shared
                # implementation (also used by fused.py and bench.py)
                return uni_vit.extract_from_uint8(cfg, params, u8)

            def fwd(params, u8):
                n, ck = u8.shape[0], self.UNI_SCAN_CHUNK
                if mesh is not None:
                    # sharded mode: the scan-chunk trick is a SINGLE-chip
                    # dispatch/tiling optimization; reshaping a
                    # 'data'-sharded batch onto a scan axis would serialize
                    # shards, so run the whole per-chip shard in one call
                    # (batch_size/n_data per chip — near the sweep optimum)
                    return one_chunk(params, u8)
                if ck and n > ck and n % ck == 0:
                    u8c = u8.reshape(n // ck, ck, *u8.shape[1:])
                    _, feats = jax.lax.scan(
                        lambda _, c: (None, one_chunk(params, c)), None, u8c)
                    return feats.reshape(n, -1)
                return one_chunk(params, u8)
        else:
            raise ValueError('feat_type must be "resnet" or "uni"')
        self.cfg = cfg
        self.raw_fwd = fwd  # unjitted (params, u8) -> (N, D); lets callers
        # fuse extra device work (e.g. serve's screening) into ONE program
        self._fwd = jax.jit(fwd)

    def upload(self, block_u8: np.ndarray) -> jax.Array:
        """Host block -> device array with this extractor's input layout
        (sharded over the mesh 'data' axis when one is configured)."""
        if self._in_shard is None:
            return jnp.asarray(block_u8)
        return jax.device_put(block_u8, self._in_shard)

    def __call__(self, patches_u8: np.ndarray) -> np.ndarray:
        """(N, ps, ps, 3) uint8 -> (N, D) f32, batched through the device."""
        n = patches_u8.shape[0]
        bs = self.batch_size
        out = np.empty((n, self.feature_dim), np.float32)
        pending = []  # (slice, device_future) double buffer
        for start in range(0, n, bs):
            block = patches_u8[start:start + bs]
            if block.shape[0] < bs:  # pad the tail to the compiled shape
                pad = np.zeros((bs - block.shape[0],) + block.shape[1:], np.uint8)
                block = np.concatenate([block, pad])
            fut = self._fwd(self.params, self.upload(block))
            pending.append((slice(start, min(start + bs, n)), fut))
            if len(pending) > 2:  # keep at most 2 batches in flight
                sl, f = pending.pop(0)
                out[sl] = np.asarray(f)[: sl.stop - sl.start]
        for sl, f in pending:
            out[sl] = np.asarray(f)[: sl.stop - sl.start]
        return out


def load_patches(patch_h5_path: str, max_patch_number: int | None,
                 rng: pyrandom.Random) -> np.ndarray:
    """Read tile datasets; subsample keys like the reference
    (``random.sample``).  Handles both the reference tile-per-dataset
    layout and the packed layout (``patch_gen.extract_patches(layout=
    'packed')``: one ``patches`` (N, ps, ps, 3) dataset)."""
    with h5py.File(patch_h5_path, "r") as f:
        if "patches" in f:  # packed layout: one bulk read
            # reproduce the tiles layout bit-for-bit: same "{x}_{y}" key
            # universe in h5py's name order, same rng.sample stream, same
            # output row order — so a given seed selects the same patches
            # regardless of storage layout
            coords = f["coords"][:]
            names = [f"{x}_{y}" for x, y in coords]
            row_of = {nm: i for i, nm in enumerate(names)}
            keys = sorted(names)
            if max_patch_number is not None and len(keys) > max_patch_number:
                keys = rng.sample(keys, max_patch_number)
            rows = np.asarray([row_of[nm] for nm in keys])
            order = np.argsort(rows)  # h5py fancy indexing wants increasing
            return f["patches"][rows[order]][np.argsort(order)]
        keys = list(f.keys())
        if max_patch_number is not None and len(keys) > max_patch_number:
            keys = rng.sample(keys, max_patch_number)
        return np.stack([f[k][:] for k in keys])


def compute_features(df, patch_data_path: str, feature_path: str,
                     extractor: FeatureExtractor, *,
                     max_patch_number: int = 4000, seed: int = 99,
                     verbose: bool = True, timer=None) -> int:
    """Reference __main__ flow over a (deduplicated) ref-file DataFrame.
    Returns the number of slides processed.  ``timer``: an optional
    ``utils.profiling.StageTimer`` accumulating read/extract throughput."""
    from sequoia_tpu.utils.profiling import StageTimer

    timer = timer or StageTimer()
    rng = pyrandom.Random(seed)
    df = df.drop_duplicates(["wsi_file_name"])
    done = 0
    for _, row in df.iterrows():
        wsi = str(row["wsi_file_name"])
        wsi_slide = wsi.split(".")[0]
        project = row.get("tcga_project", "")
        wsi = wsi.replace(".svs", "")

        patch_dir = os.path.join(patch_data_path, wsi_slide)
        if not os.path.exists(patch_dir):
            if verbose:
                print(f"Not exist {patch_dir}")
            continue
        path = os.path.join(patch_dir, wsi_slide + ".hdf5")
        path_h5 = os.path.join(feature_path, str(project), wsi)
        os.makedirs(path_h5, exist_ok=True)

        if (os.path.exists(os.path.join(path_h5, "complete_resnet.txt"))
                or os.path.exists(os.path.join(path_h5, "complete_tile.txt"))):
            if verbose:
                print(f"{wsi}: features already obtained")
            continue

        try:
            with timer.stage("read_patches", items=1):
                patches = load_patches(path, max_patch_number, rng)
            with timer.stage("extract", items=len(patches)):
                feats = extractor(patches)
            with timer.stage("write_features", items=1):
                with h5py.File(os.path.join(path_h5, wsi + ".h5"), "w") as fw:
                    fw.create_dataset(f"{extractor.feat_type}_features",
                                      data=feats)
            with open(os.path.join(path_h5, "complete_tile.txt"), "w") as fs:
                fs.write(f"Total n patch = {len(feats)}")
            done += 1
        except Exception as e:  # per-slide quarantine (reference behavior)
            print(f"{wsi}: {e}")
            continue
    if verbose and done:
        print(timer.report())
        print(f"slides/hour (feature stage): "
              f"{timer.slides_per_hour('read_patches'):.1f}")
    return done
