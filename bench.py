"""Benchmark: whole-slide pipeline on one TPU chip.

Legs (each under its own watchdog; a wedged leg degrades to the cached
value for that leg instead of killing the run):

1. ``resnet`` — device-resident headline: 4096 x 256px uint8 patches ->
   ResNet-50 (bf16) -> 100-cluster kmeans++/Lloyd -> cluster means -> ViS
   over the full 20,820-gene panel (patch pixels synthesized ON-DEVICE;
   the sandbox relay is ~MB/s vs ~10-25 GB/s PCIe on a real v5e host).
2. ``uni`` — same pipeline with the UNI ViT-L/16 backbone (bit-exact PIL
   224 resize in-graph, reference ``compute_features_hdf5.py:62-68``).
3. ``spatial`` — stride-1 spatial expression maps (BASELINE config 5):
   64x64 valid-tile grid, ~3,969 windows x 5 stacked ViS folds x 20,820
   genes, fully device-resident (one feature-table upload; window gather,
   vmapped fold forwards, and overlap scatter-add are jitted XLA
   programs — ``pipeline/spatial.py`` ``accumulate='device'``).
4. ``train`` — training plane (BASELINE configs 3 and 5): jitted ViS AdamW
   train step at the production shape (B=16, T=100, D=2048, G=20,820; bf16
   blocks with f32 LN/head) with step latency / slides/s / MFU, HE2RNA
   train step, and a full steady-state epoch through the real train loop
   (BatchLoader shapes + prefetch + on-device metrics; ``phases=('train',)``
   == the GTEx-pretrain epoch).  ``vs_baseline`` models the reference loop
   as its MEASURED per-batch host metric floor (``np.corrcoef`` over all
   20,820 genes every batch, ``vit.py:166-168``) plus a generously-modeled
   V100 fwd+bwd.
5. ``decode`` — host-side tiled-TIFF decode rate through the native C++
   reader (the host leg of the production pipeline): uncompressed RGB
   tiles, JPEG-q80 YCbCr tiles (the on-disk layout of real TCGA/Aperio
   slides), raw subsampled-YCbCr plane reads (what serving streams — no
   host upsample/convert), a MEASURED thread-count scaling sweep, and the
   240px-tile Aperio geometry (tile dims != the 256px patch grid): the
   per-patch RGB path's ~3.7x tile re-decode vs the tile-mosaic raw path
   (``ops/mosaic.py``) that decodes each unique tile ONCE.
6. ``e2e`` / ``e2e_uni`` / ``e2e_aperio`` — MEASURED wall-clock through
   ``serve.predict_slides``: two fabricated pyramidal H&E-like TIFFs with
   JPEG/YCbCr tiles (the real Aperio layout, incl. ``|AppMag = 20|``
   metadata) streamed through the REAL serving path (decode -> raw 4:2:0
   YCbCr upload at 1.5 B/px -> fused bit-exact reconstruct+screen+
   featurize -> k-means -> ViS) with cross-slide pipelining, for both
   backbones.  ``e2e_aperio`` uses 240px tiles (real Aperio SVS tile
   dims, != the 256px patch grid) so serving takes the tile-mosaic
   path — whole raw tiles decoded/uploaded once, patches assembled
   on-device (serve mode 'mosaic').  On this sandbox the host->device hop rides a slow loopback
   relay, so these legs are dominated by a transfer a real v5e host does
   ~1000x faster; the relay rate is measured and recorded in the unit
   string for transparency.

``vs_baseline``: the reference pushes one patch at a time through the
backbone (batch size 1, ``compute_features_hdf5.py`` hot loop) at
~10 ms/patch on a V100-class GPU -> ~40 s/slide features + ~10 s sklearn
KMeans -> ~72 slides/hour (ResNet).  UNI at batch 1 is ~25 ms/patch ->
~110 s/slide -> ~33 slides/hour.

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_SLIDES_PER_HOUR = 72.0  # reference resnet path, see module docstring
REF_UNI_SLIDES_PER_HOUR = 33.0
# reference spatial maps (visualize.py sliding_window_method at stride 1,
# SURVEY.md section 3.5): every window re-reads + re-featurizes its ~100
# member tiles at batch size 1 (~10 ms/patch V100-class) and repeats the
# whole sweep PER FOLD — a 64x64-tile slide has ~3,969 qualifying windows
# -> 3969 * 100 * 10 ms ~= 66 min/fold, x5 folds ~= 5.5 h/slide-map
REF_SPATIAL_MAPS_PER_HOUR = 0.18
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache.json")

PATCHES_PER_SLIDE = 4096
PATCH = 256
FEAT_BATCH = 128  # measured fastest per-patch inside the scan (v5e sweep)
UNI_FEAT_BATCH = 16  # ViT-L sweep (r3): 949 p/s at 16 vs 726 at 128 — the
# MLP hidden activation (bs x 197 x 4096) tiles much better at small bs;
# scan amortizes dispatch, so small batches cost nothing here
NUM_CLUSTERS = 100
NUM_GENES = 20820
FEAT_DIM = 2048
TIMED_SLIDES = 3
SPATIAL_GRID = 64  # spatial leg: GRID^2 valid tiles, stride-1 windows
SPATIAL_FOLDS = 5
IO_SLIDE = "/tmp/sequoia_bench_slide_8192.tiff"  # 32x32 tiles of 256px
IO_SLIDE_JPEG = "/tmp/sequoia_bench_slide_8192_jq80.tiff"  # Aperio layout
APERIO_TILE = 240  # real Aperio SVS tile side (vs the 256px patch grid)
IO_SLIDE_JPEG240 = "/tmp/sequoia_bench_slide_8192_jq80_t240.tiff"
# 4:2:2 chroma (Aperio GT450 layout): exercises the libjpeg-direct raw path
IO_SLIDE_JPEG422 = "/tmp/sequoia_bench_slide_8192_jq80_422.tiff"
E2E_JPEG_Q = 80  # fixture tiles are JPEG/YCbCr like real TCGA slides
E2E_GRID = 72  # 72x72 tiles of 256px -> 18432^2 level 0, ~4.4k tissue tiles
# grid size + layout in the filename: a recipe change must not silently
# reuse stale /tmp fixtures fabricated by an older revision
E2E_SLIDES = [f"/tmp/sequoia_bench_e2e_g{E2E_GRID}jq{E2E_JPEG_Q}_{i}.tiff"
              for i in range(2)]
E2E_SLIDES_240 = [
    f"/tmp/sequoia_bench_e2e_g{E2E_GRID}jq{E2E_JPEG_Q}t{APERIO_TILE}_{i}.tiff"
    for i in range(2)]

LEG_TIMEOUTS = {"probe": 240, "resnet": 360, "uni": 480, "spatial": 600,
                "decode": 360, "train": 600,
                "e2e": int(os.environ.get("SEQUOIA_BENCH_E2E_TIMEOUT", "900")),
                "e2e_uni": int(os.environ.get("SEQUOIA_BENCH_E2E_TIMEOUT",
                                              "900")),
                "e2e_aperio": int(os.environ.get("SEQUOIA_BENCH_E2E_TIMEOUT",
                                                 "900"))}

TRAIN_BATCH = 16       # reference default (src/main.py:40)
TRAIN_STEPS = 30       # timed steady-state steps
EPOCH_SLIDES = 256     # synthetic CV-epoch dataset (16 batches of 16)
# v5e bf16 peak per chip (MXU): the MFU denominator
V5E_BF16_PEAK = 197e12
# Reference training baseline model (src/vit.py:158-180): every batch does
# fwd+bwd on a V100-class GPU THEN syncs pred/target to host numpy and runs
# mean_absolute_error + compute_correlations — a Python loop over all 20,820
# genes calling np.corrcoef per gene (he2rna.py:140-149).  The host metric
# loop is hardware-independent (single-threaded numpy) and is MEASURED live
# by the train leg; the GPU fwd+bwd term is modeled generously at
# REF_GPU_EFFECTIVE_FLOPS (V100 fp32 peak is 15.7 TF; dense GEMM workloads
# reach ~12 TF with cuBLAS — we credit the reference the full 12).
REF_GPU_EFFECTIVE_FLOPS = 12e12


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_leg(name: str, fn, results: dict, failures: dict):
    """Execute one benchmark leg in a daemon worker thread with a join
    timeout.  A SIGALRM watchdog cannot interrupt a C call that never
    returns — observed live: a fully wedged relay blocked
    ``jax.devices()`` inside backend init for >10 min with the alarm
    pending — so the watchdog is the JOIN, which the main thread always
    controls.  A timed-out leg's thread is left behind (daemon: it cannot
    block process exit) and the run degrades to cache for that leg."""
    import threading

    seconds = LEG_TIMEOUTS[name]
    out: list = []
    err: list[BaseException] = []

    def target():
        try:
            out.append(fn())
        except BaseException as e:  # noqa: BLE001 — reported below
            err.append(e)

    t0 = time.perf_counter()
    worker = threading.Thread(target=target, daemon=True,
                              name=f"bench-leg-{name}")
    worker.start()
    worker.join(seconds)
    elapsed = time.perf_counter() - t0
    if worker.is_alive():
        failures[name] = (f"LegTimeout: {name} leg exceeded {seconds}s "
                          f"(relay wedge?)")
        log(f"[leg {name}] FAILED after {elapsed:.1f}s: {failures[name]}")
        return False
    if err:
        e = err[0]
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise e  # Ctrl-C still stops the bench
        failures[name] = f"{type(e).__name__}: {e}"
        log(f"[leg {name}] FAILED after {elapsed:.1f}s: {failures[name]}")
        return False
    results[name] = out[0]
    log(f"[leg {name}] ok in {elapsed:.1f}s")
    return True


# ---------------------------------------------------------------------------
# slide fabrication (host side, cached on disk)

def make_e2e_slide(path: str, seed: int, tile: int | None = None) -> None:
    """Fabricate a pyramidal tiled TIFF whose Otsu tissue mask keeps >4096
    tiles: ~92% H&E-like per-pixel noise (every patch distinct, so k-means
    sees real diversity), ~8% white-background tiles; JPEG-q80 YCbCr tiles
    + Aperio description = the exact layout real TCGA slides arrive in.
    ``tile`` sets the on-disk tile side (default = the 256px patch size;
    pass ``APERIO_TILE`` for the real Aperio 240px geometry, which makes
    serving take the tile-mosaic path)."""
    from sequoia_tpu import native

    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    side = E2E_GRID * PATCH
    lv0 = np.empty((side, side, 3), np.uint8)
    lv0[..., 0] = rng.integers(150, 220, (side, side), dtype=np.uint8)
    lv0[..., 1] = rng.integers(60, 140, (side, side), dtype=np.uint8)
    lv0[..., 2] = rng.integers(150, 230, (side, side), dtype=np.uint8)
    # 8% background: ~5041 grid tiles * 0.92 tissue * ~0.94 coarse-mask pass
    # ~= 4360 kept candidates — safely above the 4096 cap, so every slide
    # hits the cap and k-means always compiles ONE (4096, D) shape
    is_white = rng.random((E2E_GRID, E2E_GRID)) < 0.08
    for i, j in zip(*np.nonzero(is_white)):
        lv0[i * PATCH:(i + 1) * PATCH, j * PATCH:(j + 1) * PATCH] = (
            242 + rng.integers(0, 10, (PATCH, PATCH, 3), dtype=np.uint8))
    # JPEG/YCbCr tiles + Aperio-style description: the exact on-disk layout
    # (and metadata path) real TCGA slides take through the native reader
    t = tile or PATCH
    native.write_tiled_tiff(
        path + ".tmp", [lv0, lv0[::16, ::16]], tile=(t, t),
        jpeg_quality=E2E_JPEG_Q,
        description=f"Aperio fabricated bench fixture\n{side}x{side} "
                    "|AppMag = 20|MPP = 0.2520")
    os.replace(path + ".tmp", path)


# ---------------------------------------------------------------------------
# legs

def measure_probe():
    """Relay liveness + h2d rate; retries so a transient stall does not
    abort the whole bench."""
    import jax
    import jax.numpy as jnp

    # first backend contact happens HERE, under this leg's watchdog — a
    # relay wedged at process start must degrade to cache, not hang forever
    log(f"device: {jax.devices()[0]}")

    # 512 KB probe: small enough that a SLOW-but-alive relay (~0.05 MB/s
    # on bad days) still passes within the watchdog — the resnet/uni legs
    # synthesize patches on-device and barely need h2d, so they should
    # run live whenever the relay moves at all; only the e2e leg needs
    # real bandwidth, and it checks the measured rate itself
    last = None
    for attempt in range(3):
        try:
            # warm-up: SAME-SHAPE put + sum compiles the transfer and sync
            # programs and pays the first-dispatch cost OUTSIDE the timed
            # window (a different warm-up shape would recompile the slice
            # inside the timed region and understate the rate, which feeds
            # the e2e leg's bandwidth gate)
            warm = jax.device_put(np.zeros((512 * 1024,), np.uint8))
            _ = float(jnp.sum(warm[:8].astype(jnp.int32)))
            probe = np.zeros((512 * 1024,), np.uint8)
            t0 = time.perf_counter()
            pd_ = jax.device_put(probe)
            _ = float(jnp.sum(pd_[:8].astype(jnp.int32)))
            rate = 0.5 / (time.perf_counter() - t0)
            log(f"sandbox relay h2d probe: {rate:.2f} MB/s "
                f"(attempt {attempt + 1})")
            return rate
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(3)
    raise RuntimeError(f"relay probe failed 3x: {last}")


def _aggregate_fns(feat_dim: int):
    """kmeans + cluster-means + full-width ViS tail, pre-compiled shapes."""
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.models import vis
    from sequoia_tpu.ops import kmeans as km

    vis_cfg = vis.ViSConfig(num_outputs=NUM_GENES, input_dim=feat_dim,
                            depth=6, nheads=16, dim_f=64, dim_s=64, dim_c=64,
                            num_clusters=NUM_CLUSTERS)
    vis_params = vis.init(vis_cfg, jax.random.PRNGKey(1))
    vis_fwd = jax.jit(lambda p, x: vis.apply(vis_cfg, p, x))
    mask_all = jnp.ones((PATCHES_PER_SLIDE,), bool)

    def aggregate(feats, key):
        # three pre-compiled programs, data stays on device between them
        # (one combined jit stalls this sandbox's remote-compile service)
        _, labels, _, _ = km.kmeans_fit(feats, mask_all, key,
                                        n_clusters=NUM_CLUSTERS)
        cf = km.cluster_means(feats, labels, mask_all,
                              n_clusters=NUM_CLUSTERS)
        return vis_fwd(vis_params, cf[None])[0]

    return aggregate, vis_cfg, vis_params


def measure_device_pipeline(backbone: str):
    """Device-resident slides/hour: on-device synthesized patches -> backbone
    -> kmeans -> ViS (the sandbox relay never touches the timed region)."""
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.models import resnet, uni_vit
    from sequoia_tpu.pipeline.features import FeatureExtractor

    bs = FEAT_BATCH if backbone == "resnet" else UNI_FEAT_BATCH
    n_batches = PATCHES_PER_SLIDE // bs
    base_dev = jax.random.randint(jax.random.PRNGKey(42),
                                  (bs, PATCH, PATCH, 3), 0, 256,
                                  jnp.uint8)

    if backbone == "resnet":
        cfg = resnet.ResNetConfig(compute_dtype=jnp.bfloat16)
        params = resnet.random_params(jax.random.PRNGKey(0))
        timed = TIMED_SLIDES
    else:
        cfg = uni_vit.UniViTConfig(compute_dtype=jnp.bfloat16)
        # params materialize ON DEVICE (per-tensor RNG ops) — a host-side
        # ViT-L pytree would trip the sandbox relay's upload limits
        params = uni_vit.random_params(cfg, jax.random.PRNGKey(0))
        timed = max(2, TIMED_SLIDES - 1)
    # time the EXACT program serving runs (preprocessing fused the same
    # way), not a hand-rolled copy that could drift from the product path
    extractor = FeatureExtractor(backbone, params, batch_size=bs, cfg=cfg)
    one_batch, feat_dim = extractor.raw_fwd, extractor.feature_dim

    @jax.jit
    def features(p, base_u8, key):
        def step(_, k):
            bits = jax.random.bits(k, base_u8.shape, jnp.uint8)
            return None, one_batch(p, base_u8 ^ bits)

        _, feats = jax.lax.scan(step, None, jax.random.split(key, n_batches))
        return feats.reshape(-1, feat_dim)

    aggregate, _, _ = _aggregate_fns(feat_dim)

    log(f"[{backbone}] warmup (compile features)...")
    t0 = time.perf_counter()
    feats = features(params, base_dev, jax.random.PRNGKey(0))
    _ = float(feats[0, 0])
    log(f"[{backbone}] features compiled+ran in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    pred = aggregate(feats, jax.random.PRNGKey(0))
    # warm the SAME sync the timed loop uses (a pred[0] warm-up would leave
    # the jnp.sum program to compile inside the timed window)
    _ = float(jnp.sum(pred))
    log(f"[{backbone}] aggregate compiled+ran in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(timed):
        key = jax.random.PRNGKey(i + 1)
        pred = aggregate(features(params, base_dev, key), key)
    s = float(jnp.sum(pred))  # host readback = full sync through the relay
    elapsed = time.perf_counter() - t0
    assert np.isfinite(s)
    per_slide = elapsed / timed
    log(f"[{backbone}] per-slide: {per_slide:.3f}s "
        f"({PATCHES_PER_SLIDE / per_slide:.0f} patches/s)")
    return per_slide


def measure_spatial():
    """Spatial sliding-window stage (BASELINE config 5): a 64x64 valid-tile
    grid at stride 1 (~3,969 windows), 5 stacked ViS folds over the FULL
    20,820-gene head, fully device-resident (`accumulate='device'`): the
    2048-d tile-feature table uploads once, window gather / vmapped fold
    forwards / overlap scatter-add run as jitted XLA programs.  Returns
    seconds per slide-map (all folds, all genes)."""
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from sequoia_tpu.models import vis
    from sequoia_tpu.pipeline import spatial

    GRID, FOLDS = SPATIAL_GRID, SPATIAL_FOLDS
    df = pd.DataFrame([(x * PATCH, y * PATCH)
                       for x in range(GRID) for y in range(GRID)],
                      columns=["xcoord", "ycoord"])
    df["xcoord_tf"] = df.xcoord // PATCH
    df["ycoord_tf"] = df.ycoord // PATCH
    n = len(df)
    rng = np.random.default_rng(0)
    # one 32 MB table upload (once per slide in production too); params
    # materialize on device (jax.random init ops)
    tile_feats = rng.normal(size=(n, FEAT_DIM)).astype(np.float32)
    vis_cfg = vis.ViSConfig(num_outputs=NUM_GENES, input_dim=FEAT_DIM,
                            depth=6, nheads=16, dim_f=64, dim_s=64, dim_c=64,
                            num_clusters=NUM_CLUSTERS)
    stacked = spatial.make_vis_stacked_predict_fn(
        vis_cfg, {f: vis.init(vis_cfg, jax.random.PRNGKey(f))
                  for f in range(FOLDS)})
    gene_idx = np.arange(NUM_GENES)

    def run():
        _, sums, counts = spatial.sliding_window_predict_arrays(
            tile_feats, df, stacked, gene_idx, stride=1,
            accumulate="device", _device_sums=True)
        # device-side sync (the (5, 4096, 20820) readback is PCIe-trivial
        # in production but ~100x relay-dominated here — excluded, like
        # the device legs' on-device patch synthesis)
        s = float(sum(jnp.sum(v) for v in sums.values()))
        assert np.isfinite(s) and counts.max() > 0
        return s

    log("[spatial] warmup (compile gather/forward/scatter)...")
    t0 = time.perf_counter()
    run()
    log(f"[spatial] warmup in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    run()
    per_map = time.perf_counter() - t0
    log(f"[spatial] stride-1 map: {per_map:.2f}s "
        f"(~3969 windows x {FOLDS} folds x {NUM_GENES} genes)")
    return per_map


def _vis_train_flops(cfg, batch: int) -> float:
    """Analytic matmul FLOPs for one ViS train step (fwd + 2x for bwd).
    Elementwise/LN/mean terms are negligible next to the GEMMs."""
    T, D, H = cfg.num_clusters, cfg.input_dim, cfg.nheads
    per_block = (2 * T * D * H * cfg.dim_f            # fused f projection
                 + 2 * T * D * H * cfg.dim_s          # fused s projection
                 + 2 * T * H * (cfg.dim_f + cfg.dim_s) * cfg.dim_c  # combine
                 + 2 * T * (H * cfg.dim_c) * D        # output projection
                 + 4 * T * D * D)                     # FeedForward (D->D->D)
    fwd = cfg.depth * per_block + 2 * D * cfg.num_outputs  # + gene head
    return 3.0 * fwd * batch


def measure_train():
    """Training-plane throughput (BASELINE configs 3 and 5).

    a. ViS jitted train step at the production shape (B=16, T=100 cluster
       tokens, D=2048, G=20,820; bf16 blocks with f32 LayerNorm/head —
       ``ViSConfig(compute_dtype='bfloat16')``): step latency, slides/s,
       and an MFU estimate against the v5e bf16 peak.
    b. HE2RNA train step (Adam, Dropout(0.5), random-k sampling — reference
       ``he2rna.py:108-127``) at the same shape.
    c. A full epoch through ``train.loop.train`` — BatchLoader-shaped
       batches, host prefetch, on-device metrics, early-stop bookkeeping —
       with ``phases=('train',)``, which is EXACTLY the GTEx-pretrain epoch
       shape (reference ``pretrain_gtex.py:114-122`` trains single-phase).
    d. The reference's per-batch HOST metric floor, measured live: sklearn
       ``mean_absolute_error`` + ``compute_correlations`` = a Python loop
       over all genes calling ``np.corrcoef`` per gene on host numpy
       (``vit.py:166-168``, ``he2rna.py:140-149``) — this runs EVERY batch
       in the reference train loop, on top of the GPU fwd+bwd.
    """
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.models import he2rna, vis
    from sequoia_tpu.train import he2rna_fit, loop

    B, T, D, G = TRAIN_BATCH, NUM_CLUSTERS, FEAT_DIM, NUM_GENES
    rng = np.random.default_rng(0)
    feats_h = rng.normal(size=(B, T, D)).astype(np.float32)
    rna_h = rng.normal(size=(B, G)).astype(np.float32)
    feats = jax.device_put(feats_h)
    rna = jax.device_put(rna_h)
    valid = jax.device_put(np.ones((B,), bool))

    out = {}

    # -- (a) ViS production train step, bf16 compute -----------------------
    cfg = vis.ViSConfig(num_outputs=G, input_dim=D, depth=6, nheads=16,
                        dim_f=64, dim_s=64, dim_c=64, num_clusters=T,
                        compute_dtype="bfloat16")
    params = vis.init(cfg, jax.random.PRNGKey(0))
    opt = loop.make_adamw(1e-3)
    opt_state = opt.init(params)
    train_step, _ = loop.make_step_fns(lambda p, x: vis.apply(cfg, p, x), opt)

    log("[train] compiling ViS train step (B=16, D=2048, G=20820, bf16)...")
    t0 = time.perf_counter()
    params, opt_state, m = train_step(params, opt_state, feats, rna, valid)
    loss0 = float(m["loss"])
    log(f"[train] ViS step compiled+ran in {time.perf_counter() - t0:.1f}s "
        f"(loss {loss0:.4f})")
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        params, opt_state, m = train_step(params, opt_state, feats, rna, valid)
    loss = float(m["loss"])  # blocks: full device sync
    step_s = (time.perf_counter() - t0) / TRAIN_STEPS
    assert np.isfinite(loss) and loss < loss0, (loss0, loss)
    flops = _vis_train_flops(cfg, B)
    out["vis_step_ms"] = step_s * 1e3
    out["vis_slides_per_sec"] = B / step_s
    out["vis_mfu_pct"] = 100.0 * flops / step_s / V5E_BF16_PEAK
    out["vis_tflops"] = flops / step_s / 1e12
    log(f"[train] ViS step {step_s * 1e3:.2f} ms = {B / step_s:.0f} slides/s, "
        f"{out['vis_tflops']:.1f} TF/s ({out['vis_mfu_pct']:.1f}% MFU; "
        "backward-dominated — per-piece roofline in docs/BENCHMARKS.md "
        "\"train-step close-out\", tools/profile_train_step.py)")

    # -- (b) HE2RNA train step ---------------------------------------------
    hcfg = he2rna.HE2RNAConfig(input_dim=D, output_dim=G)
    hparams = he2rna.init(hcfg, jax.random.PRNGKey(1))
    hopt = loop.make_adam(1e-3)
    hopt_state = hopt.init(hparams)
    h_train, _ = he2rna_fit.make_he2rna_step_fns(hcfg, hopt)
    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    hparams, hopt_state, hl, key = h_train(hparams, hopt_state, feats, rna,
                                           valid, key)
    _ = float(hl)
    log(f"[train] HE2RNA step compiled+ran in {time.perf_counter() - t0:.1f}s")
    # the RNG chains THROUGH the jitted step (split on device), so this
    # loop — like the real fit() loop — pays no per-step host key dispatch;
    # round 4's 47 ms here was exactly that dispatch cost, not the model
    # (device step: ~10 ms; see tools/profile_train_step.py per-k table)
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        hparams, hopt_state, hl, key = h_train(hparams, hopt_state, feats,
                                               rna, valid, key)
    assert np.isfinite(float(hl))
    h_step_s = (time.perf_counter() - t0) / TRAIN_STEPS
    out["he2rna_step_ms"] = h_step_s * 1e3
    out["he2rna_slides_per_sec"] = B / h_step_s
    log(f"[train] HE2RNA step {h_step_s * 1e3:.2f} ms "
        f"= {B / h_step_s:.0f} slides/s (random-k lax.switch step; per-k "
        "device costs 6.5-14 ms, see profile_train_step.py)")

    # -- (c) full epoch through the real train loop (= GTEx pretrain) ------
    from sequoia_tpu.data.dataset import Batch

    n_batches = EPOCH_SLIDES // B
    ep_rng = np.random.default_rng(1)
    batches = [Batch(ep_rng.normal(size=(B, T, D)).astype(np.float32),
                     ep_rng.normal(size=(B, G)).astype(np.float32),
                     np.ones((B,), bool), [f"w{i}_{j}" for j in range(B)],
                     ["TCGA-BENCH"] * B)
               for i in range(n_batches)]

    class _Loader:
        def __iter__(self):
            return iter(batches)

    marks = []
    cfg2 = cfg
    params2 = vis.init(cfg2, jax.random.PRNGKey(3))
    loop.train(lambda p, x: vis.apply(cfg2, p, x), params2,
               loop.make_adamw(3e-3), {"train": _Loader()},
               num_epochs=3, phases=("train",), verbose=False,
               # bf16 config => host-side bf16 batch cast halves the h2d
               # bytes bit-identically (loop.train docstring)
               h2d_dtype="bfloat16",
               log_fn=lambda e, ph, m_: marks.append(time.perf_counter()))
    epoch_s = marks[2] - marks[1]  # steady state: epochs 0-1 pay compiles
    out["epoch_slides_per_hour"] = EPOCH_SLIDES / epoch_s * 3600.0
    log(f"[train] steady epoch ({EPOCH_SLIDES} slides, BatchLoader shapes + "
        f"prefetch + metrics): {epoch_s:.2f}s "
        f"= {out['epoch_slides_per_hour']:.0f} slides/h")

    # -- (d) the reference's measured host-metric floor --------------------
    pred_h = rna_h + rng.normal(size=rna_h.shape).astype(np.float32) * 0.1
    t0 = time.perf_counter()
    _mae = float(np.mean(np.abs(rna_h - pred_h)))
    corrs = []
    for i in range(G):  # the reference's per-gene np.corrcoef loop
        y = rna_h[:, i]
        if len(np.unique(y)) > 1:
            corrs.append(np.corrcoef(y, pred_h[:, i])[0, 1])
    host_metric_s = time.perf_counter() - t0
    assert np.isfinite(np.nanmean(corrs))
    ref_gpu_s = _vis_train_flops(cfg, B) / REF_GPU_EFFECTIVE_FLOPS
    ref_step_s = host_metric_s + ref_gpu_s
    out["ref_host_metric_s_per_batch"] = host_metric_s
    out["ref_step_s_modeled"] = ref_step_s
    out["vs_ref_epoch"] = (out["epoch_slides_per_hour"]
                           / (B / ref_step_s * 3600.0))
    log(f"[train] reference floor: host metrics {host_metric_s:.2f}s/batch "
        f"(measured, np.corrcoef x {G} genes) + modeled V100 fwd+bwd "
        f"{ref_gpu_s * 1e3:.0f}ms -> {B / ref_step_s:.1f} slides/s; "
        f"our epoch is {out['vs_ref_epoch']:.1f}x")
    return out


def measure_decode():
    """Host-side WSI decode rate through the native C++ tiled-TIFF reader
    (single-core sandbox host; a real v5e host has >100 cores and the
    reader's handle pool scales per-core).  Measures BOTH tile layouts:
    uncompressed RGB and JPEG-q80 YCbCr (real TCGA/Aperio slides are
    JPEG-compressed — ``tiffreader.cpp`` JPEGCOLORMODE_RGB fast path).
    Returns ``{"raw": patches/s, "jpeg": patches/s}``."""
    from sequoia_tpu import native

    if not native.available():
        raise RuntimeError("native tiff reader unavailable")
    fixtures = {"raw": (IO_SLIDE, 0), "jpeg": (IO_SLIDE_JPEG, E2E_JPEG_Q)}
    for path, q in fixtures.values():
        if not os.path.exists(path):
            rng = np.random.default_rng(7)
            block = rng.integers(0, 256, (2048, 2048, 3), dtype=np.uint8)
            lv0 = np.tile(block, (4, 4, 1))  # 8192^2, incompressible content
            native.write_tiled_tiff(path + ".tmp", [lv0, lv0[::16, ::16]],
                                    tile=(PATCH, PATCH), jpeg_quality=q)
            os.replace(path + ".tmp", path)

    coords = [(x * PATCH, y * PATCH) for x in range(32) for y in range(32)]
    nthreads = 8

    def timed_pass(read, n_target: int) -> float:
        t0 = time.perf_counter()
        done = 0
        while done < n_target:
            for s in range(0, len(coords), 512):
                done += read(coords[s:s + 512]).shape[0]
                if done >= n_target:
                    break
        return done / (time.perf_counter() - t0)

    rates: dict = {}
    for layout, (path, _q) in fixtures.items():
        reader = native.NativeTiffReader(path)
        reader.read_regions(coords[:64], 0, (PATCH, PATCH), nthreads=nthreads)
        # best of 3 passes: the single shared sandbox core makes one-shot
        # decode rates swing 2-3x with background load
        rate = max(timed_pass(
            lambda c: reader.read_regions(c, 0, (PATCH, PATCH),
                                          nthreads=nthreads),
            PATCHES_PER_SLIDE) for _ in range(3))
        rates[layout] = rate
        log(f"decode[{layout}]: {rate:.0f} patches/s ({nthreads} threads, "
            f"{os.cpu_count()} host cores)")
        if layout == "jpeg":
            # raw subsampled-YCbCr reads (what serving streams): skips
            # libjpeg's host-side upsample+convert AND returns half the
            # bytes — measure the host-side rate delta explicitly
            if reader.ycbcr_subsampling(0, (PATCH, PATCH)):
                rates["jpeg_ycbcr"] = max(timed_pass(
                    lambda c: reader.read_regions_ycbcr(c, 0, (PATCH, PATCH),
                                                        nthreads=nthreads),
                    PATCHES_PER_SLIDE) for _ in range(3))
                log(f"decode[jpeg_ycbcr]: {rates['jpeg_ycbcr']:.0f} "
                    "patches/s (raw planes)")
            # thread-scaling curve, MEASURED not asserted (VERDICT r3): on
            # this 1-core sandbox it shows the plateau honestly; on a
            # multi-core host it shows the per-core scaling the projection
            # relies on
            sweep = {}
            for nt in (1, 2, 4, 8):
                sweep[nt] = round(timed_pass(
                    lambda c: reader.read_regions(c, 0, (PATCH, PATCH),
                                                  nthreads=nt), 1024), 1)
            rates["thread_sweep_jpeg"] = sweep
            log(f"decode[jpeg] thread sweep ({os.cpu_count()} cores): "
                f"{sweep}")
        reader.close()

    # Real Aperio tile geometry: 240px JPEG tiles under the 256px patch
    # grid.  Per-patch RGB reads JPEG-decode every tile a patch touches
    # (~3.7x re-decode amplification, ops/mosaic.py module docstring); the
    # tile-mosaic raw path (serve mode 'mosaic') decodes each unique tile
    # ONCE as subsampled planes.  Measure both on the same fixture so the
    # host-side win is a number, not an estimate.
    from sequoia_tpu.ops import mosaic

    if not os.path.exists(IO_SLIDE_JPEG240):
        rng = np.random.default_rng(7)
        block = rng.integers(0, 256, (2048, 2048, 3), dtype=np.uint8)
        lv0 = np.tile(block, (4, 4, 1))
        native.write_tiled_tiff(IO_SLIDE_JPEG240 + ".tmp",
                                [lv0, lv0[::16, ::16]],
                                tile=(APERIO_TILE, APERIO_TILE),
                                jpeg_quality=E2E_JPEG_Q)
        os.replace(IO_SLIDE_JPEG240 + ".tmp", IO_SLIDE_JPEG240)
    r240 = native.NativeTiffReader(IO_SLIDE_JPEG240)
    r240.read_regions(coords[:64], 0, (PATCH, PATCH), nthreads=nthreads)
    rates["jpeg240_patch_rgb"] = max(timed_pass(
        lambda c: r240.read_regions(c, 0, (PATCH, PATCH),
                                    nthreads=nthreads),
        PATCHES_PER_SLIDE) for _ in range(3))
    log(f"decode[jpeg240_patch_rgb]: {rates['jpeg240_patch_rgb']:.0f} "
        "patches/s (256px patches over 240px tiles, per-patch re-decode)")
    tdim = (APERIO_TILE, APERIO_TILE)
    if r240.ycbcr_subsampling(0, tdim):
        plans = list(mosaic.plan_chunks(
            coords, PATCH, tdim, r240.level_dimensions[0]))

        def mosaic_pass() -> float:
            t0 = time.perf_counter()
            done = 0
            while done < PATCHES_PER_SLIDE:
                for c in plans:
                    locs = [(int(tx * APERIO_TILE), int(ty * APERIO_TILE))
                            for tx, ty in c.tiles]
                    r240.read_regions_ycbcr(locs, 0, tdim,
                                            nthreads=nthreads)
                    done += len(c.orig)
                    if done >= PATCHES_PER_SLIDE:
                        break
            return done / (time.perf_counter() - t0)

        rates["jpeg240_mosaic_ycbcr"] = max(mosaic_pass() for _ in range(3))
        log(f"decode[jpeg240_mosaic_ycbcr]: "
            f"{rates['jpeg240_mosaic_ycbcr']:.0f} patches/s (each unique "
            "240px tile decoded once as raw planes; assembly is on-device)")
    r240.close()

    # 4:2:2 chroma (Aperio GT450): libtiff's raw mode is broken there, so
    # raw-plane reads go through the reader's libjpeg-direct tile decode —
    # measure that path's host rate alongside the libtiff-raw 4:2:0 one
    if not os.path.exists(IO_SLIDE_JPEG422):
        rng = np.random.default_rng(7)
        block = rng.integers(0, 256, (2048, 2048, 3), dtype=np.uint8)
        lv0 = np.tile(block, (4, 4, 1))
        native.write_tiled_tiff(IO_SLIDE_JPEG422 + ".tmp",
                                [lv0, lv0[::16, ::16]],
                                tile=(PATCH, PATCH),
                                jpeg_quality=E2E_JPEG_Q,
                                subsampling=(2, 1))
        os.replace(IO_SLIDE_JPEG422 + ".tmp", IO_SLIDE_JPEG422)
    r422 = native.NativeTiffReader(IO_SLIDE_JPEG422)
    if r422.ycbcr_subsampling(0, (PATCH, PATCH)) == (2, 1):
        r422.read_regions_ycbcr(coords[:64], 0, (PATCH, PATCH),
                                nthreads=nthreads)
        rates["jpeg422_ycbcr"] = max(timed_pass(
            lambda c: r422.read_regions_ycbcr(c, 0, (PATCH, PATCH),
                                              nthreads=nthreads),
            PATCHES_PER_SLIDE) for _ in range(3))
        log(f"decode[jpeg422_ycbcr]: {rates['jpeg422_ycbcr']:.0f} "
            "patches/s (4:2:2 raw planes via libjpeg-direct)")
    r422.close()
    return rates


#: the e2e leg streams ~0.45 GB of raw 4:2:0 YCbCr planes per slide PASS
#: (serve's raw-YCbCr mode: 1.5 B/px instead of the RGB path's 3 B/px) —
#: the warmup slide plus the 2-slide timed loop is ~1.4 GB total; below
#: this relay rate it cannot finish inside its watchdog (1.4 GB / 900 s =
#: 1.6 MB/s for h2d alone, before TIFF fabrication and compiles), so it
#: degrades early with an explicit reason instead of burning the 900 s
MIN_E2E_RELAY_MBPS = 2.5


def measure_e2e_serving(relay_rate: float | None = None,
                        backbone: str = "resnet",
                        slides: list[str] | None = None,
                        tile: int | None = None,
                        expect_mode: str | None = None):
    """MEASURED wall-clock slides/hour through serve.predict_slides on
    fabricated pyramidal TIFFs — the real streaming path (decode -> raw
    subsampled-YCbCr upload -> fused reconstruct+screen+featurize ->
    kmeans -> ViS) with >=2-slide cross-slide overlap.  ``slides``/``tile``
    select the fixture layout (default: patch-size tiles); ``expect_mode``
    asserts which producer mode serving picks, so the leg measures the
    path it claims to (e.g. 'mosaic' for 240px Aperio tiles).

    Returns ``{"s_per_slide": float, "audit": {...}}`` — the audit block
    (bytes/slide, effective h2d MB/s, relay probe, candidates/kept,
    decode threads/cores) is published inside the with_io JSON so
    measured-vs-projected is checkable from the artifact alone."""
    if relay_rate is not None and relay_rate < MIN_E2E_RELAY_MBPS:
        raise RuntimeError(
            f"relay too slow for the e2e leg ({relay_rate:.2f} MB/s < "
            f"{MIN_E2E_RELAY_MBPS}; needs ~1.4 GB of h2d inside the "
            f"watchdog)")
    import jax
    import jax.numpy as jnp

    from sequoia_tpu.models import resnet, uni_vit, vis
    from sequoia_tpu.pipeline.features import FeatureExtractor
    from sequoia_tpu.serve import SlidePredictor

    if slides is None:
        slides = E2E_SLIDES
    for i, path in enumerate(slides):
        make_e2e_slide(path, seed=100 + i, tile=tile)

    if backbone == "resnet":
        extractor = FeatureExtractor(
            "resnet", resnet.random_params(jax.random.PRNGKey(0)),
            batch_size=FEAT_BATCH,
            cfg=resnet.ResNetConfig(compute_dtype=jnp.bfloat16))
    else:
        ucfg = uni_vit.UniViTConfig(compute_dtype=jnp.bfloat16)
        extractor = FeatureExtractor(
            "uni", uni_vit.random_params(ucfg, jax.random.PRNGKey(0)),
            batch_size=FEAT_BATCH, cfg=ucfg)
    vis_cfg = vis.ViSConfig(num_outputs=NUM_GENES,
                            input_dim=extractor.feature_dim,
                            depth=6, nheads=16, dim_f=64, dim_s=64, dim_c=64,
                            num_clusters=NUM_CLUSTERS)
    vis_params = vis.init(vis_cfg, jax.random.PRNGKey(1))
    pred = SlidePredictor(extractor, [(vis_cfg, vis_params)],
                          n_clusters=NUM_CLUSTERS,
                          max_patches=PATCHES_PER_SLIDE, patch_size=PATCH)

    if expect_mode is not None:
        tup = pred._start_producer(slides[0])
        tup[3].set()  # stop: the gated put() refuses, so the thread exits
        tup[1].join(timeout=60)
        if tup[1].is_alive():
            # a wedged probe thread would keep decoding on the shared
            # native pool and skew the timed runs below — fail the leg
            raise RuntimeError("producer-mode probe thread failed to exit "
                               "within 60s; not timing against it")
        if tup[4] != expect_mode:
            raise RuntimeError(f"serving picked mode {tup[4]!r}, leg "
                               f"expects {expect_mode!r} for this fixture "
                               "layout")

    log(f"[e2e:{backbone}] warmup slide (compiles fused program + "
        "aggregation)...")
    t0 = time.perf_counter()
    out = pred.predict_wsi(slides[0])
    assert np.isfinite(out).all() and out.shape == (1, NUM_GENES)
    warm = time.perf_counter() - t0
    log(f"[e2e:{backbone}] warmup slide in {warm:.1f}s")

    from sequoia_tpu.data.wsi import DEFAULT_DECODE_THREADS

    io0 = dict(pred.io_stats)
    t0 = time.perf_counter()
    n = 0
    for _path, out in pred.predict_slides(slides):
        assert np.isfinite(out).all()
        n += 1
    elapsed = time.perf_counter() - t0
    per_slide = elapsed / n
    d = {k: pred.io_stats[k] - io0[k] for k in io0}
    audit = {
        "slides_timed": n,
        "bytes_uploaded_per_slide_mb": round(d["bytes_uploaded"] / n / 1e6, 1),
        "effective_h2d_mbps": round(d["bytes_uploaded"] / elapsed / 1e6, 2),
        "relay_probe_mbps": round(relay_rate, 2) if relay_rate else None,
        "candidates_per_slide": d["candidates"] // n,
        "kept_per_slide": d["kept"] // n,
        "decode_threads": DEFAULT_DECODE_THREADS,
        "host_cores": os.cpu_count(),
    }
    log(f"[e2e:{backbone}] {n} slides in {elapsed:.1f}s -> "
        f"{per_slide:.2f}s/slide (cross-slide pipelined; "
        f"{audit['bytes_uploaded_per_slide_mb']} MB/slide h2d at "
        f"{audit['effective_h2d_mbps']} MB/s effective)")
    return {"s_per_slide": per_slide, "audit": audit}


# ---------------------------------------------------------------------------

def main() -> None:
    # persistent XLA executable cache: repeat runs skip the ~25-100s
    # first-jit warmups (warmup time is never part of a timed loop, so
    # the published numbers are unaffected; cache keys include the jax
    # version, so staleness is handled upstream)
    try:
        import jax  # deferred: backend contact stays inside leg watchdogs
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/sequoia_bench_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except (ImportError, AttributeError) as e:  # older jax: run uncached
        log(f"[cache] persistent compile cache unavailable: {e}")

    cached = {}
    if os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                cached = json.load(f)
        except Exception:  # noqa: BLE001
            cached = {}

    results: dict = {}
    failures: dict = {}

    if not run_leg("probe", measure_probe, results, failures):
        # relay is down: everything device-side would wedge — emit cache
        _emit_fallback(failures["probe"], cached)
        return
    relay_rate = results["probe"]

    def timed_out(leg: str) -> bool:
        return failures.get(leg, "").startswith("LegTimeout")

    run_leg("resnet", lambda: measure_device_pipeline("resnet"),
            results, failures)
    # a TIMED-OUT device leg leaves its daemon thread dispatching device
    # work (a join timeout cannot cancel a C-blocked thread); running more
    # device legs would contend with it and record inflated-but-"fresh"
    # numbers into the cache — skip them and degrade to cache instead
    remaining_legs = [
        ("uni", lambda: measure_device_pipeline("uni")),
        ("spatial", lambda: measure_spatial()),
        ("train", lambda: measure_train()),
        ("decode", lambda: measure_decode()),  # host-only: always safe
        ("e2e", lambda: measure_e2e_serving(relay_rate)),
        ("e2e_uni", lambda: measure_e2e_serving(relay_rate, backbone="uni")),
        # real Aperio tile geometry (240px tiles != 256px patches): serving
        # must take the tile-mosaic path, asserted via expect_mode
        ("e2e_aperio",
         lambda: measure_e2e_serving(relay_rate, slides=E2E_SLIDES_240,
                                     tile=APERIO_TILE, expect_mode="mosaic")),
    ]
    device_ran = ["resnet"]
    for name, fn in remaining_legs:
        if name != "decode" and any(timed_out(leg) for leg in device_ran):
            failures[name] = ("skipped: a device leg timed out; its "
                              "abandoned thread may still hold the device")
            log(f"[leg {name}] {failures[name]}")
        else:
            run_leg(name, fn, results, failures)
        if name != "decode":
            device_ran.append(name)

    out: dict = {}
    if "resnet" in results:
        sph = 3600.0 / results["resnet"]
        out.update({
            "metric": "slides_per_hour_e2e_1chip",
            "value": round(sph, 1),
            "unit": ("slides/hour (4096x256px uint8 patches -> resnet50 "
                     "bf16 -> kmeans100 -> ViS 20820 genes, device-resident)"),
            "vs_baseline": round(sph / REF_SLIDES_PER_HOUR, 2),
        })
    elif cached.get("metric"):
        out.update({k: cached[k] for k in
                    ("metric", "value", "unit", "vs_baseline") if k in cached})
        out["cached"] = True
        out["cache_reason"] = failures.get("resnet", "leg skipped")

    if "uni" in results:
        sph = 3600.0 / results["uni"]
        out["uni"] = {
            "metric": "uni_slides_per_hour_1chip",
            "value": round(sph, 1),
            "unit": ("slides/hour (4096 patches -> bit-exact PIL 224 resize "
                     "-> UNI ViT-L/16 bf16 -> kmeans100 -> ViS 20820 genes, "
                     "device-resident)"),
            "vs_baseline": round(sph / REF_UNI_SLIDES_PER_HOUR, 2),
        }
    elif isinstance(cached.get("uni"), dict):
        out["uni"] = {**cached["uni"], "cached": True,
                      "cache_reason": failures.get("uni", "leg skipped")}

    if "spatial" in results:
        mph = 3600.0 / results["spatial"]
        out["spatial"] = {
            "metric": "spatial_maps_per_hour_1chip",
            "value": round(mph, 1),
            "unit": ("stride-1 spatial expression maps/hour (64x64 tile "
                     "grid ~3969 windows x 5 ViS folds x 20820 genes, "
                     "device-resident window gather/forward/scatter over a "
                     "cached feature table; reference re-featurizes every "
                     "tile per window per fold ~= 5.5 h/map)"),
            "vs_baseline": round(mph / REF_SPATIAL_MAPS_PER_HOUR, 2),
        }
    elif isinstance(cached.get("spatial"), dict):
        out["spatial"] = {**cached["spatial"], "cached": True,
                          "cache_reason": failures.get("spatial",
                                                       "leg skipped")}

    if "train" in results:
        tr = results["train"]
        out["train"] = {
            "metric": "vis_train_step_ms",
            "value": round(tr["vis_step_ms"], 2),
            "unit": ("ms per jitted ViS AdamW train step at the production "
                     "shape (B=16 slides, 100 cluster tokens, D=2048, "
                     "G=20820; bf16 blocks, f32 LN/head/optimizer) incl. "
                     "on-device loss/MAE/Pearson metrics — the reference "
                     "syncs preds to host numpy and loops np.corrcoef over "
                     "all genes EVERY batch (vit.py:158-180)"),
            "slides_per_sec_step": round(tr["vis_slides_per_sec"], 1),
            "tflops": round(tr["vis_tflops"], 1),
            "mfu_pct": round(tr["vis_mfu_pct"], 1),
            "he2rna_step_ms": round(tr["he2rna_step_ms"], 2),
            "epoch_slides_per_hour": round(tr["epoch_slides_per_hour"], 0),
            "epoch_unit": ("slides/hour through a steady-state training "
                           f"epoch ({EPOCH_SLIDES} slides) via the REAL "
                           "train loop — BatchLoader-shaped batches, host "
                           "prefetch, h2d over the sandbox relay, on-device "
                           "metrics, early-stop bookkeeping; phases="
                           "('train',) == the GTEx-pretrain epoch shape "
                           "(pretrain_gtex.py:114-122)"),
            "ref_host_metric_s_per_batch": round(
                tr["ref_host_metric_s_per_batch"], 3),
            "vs_baseline": round(tr["vs_ref_epoch"], 2),
            "vs_baseline_unit": ("epoch slides/h vs the reference loop "
                                 "modeled as measured host per-batch "
                                 "metrics (np.corrcoef x 20820 genes, "
                                 "measured on this host) + V100 fwd+bwd "
                                 "credited a generous 12 TFLOP/s"),
        }
    elif isinstance(cached.get("train"), dict):
        out["train"] = {**cached["train"], "cached": True,
                        "cache_reason": failures.get("train", "leg skipped")}

    if "decode" not in results and isinstance(cached.get("decode"), dict):
        out["decode"] = {**cached["decode"], "cached": True,
                         "cache_reason": failures.get("decode", "leg skipped")}
    if "decode" in results:
        out["decode"] = {
            "metric": "native_decode_patches_per_sec",
            "raw": round(results["decode"]["raw"], 0),
            "jpeg": round(results["decode"]["jpeg"], 0),
            "unit": ("256px patches/s through the native C++ reader, 8 "
                     f"decode threads on {os.cpu_count()} host core(s); "
                     "'jpeg' = JPEG-q80 YCbCr tiles (the real TCGA/Aperio "
                     "layout), 'raw' = uncompressed RGB, 'jpeg_ycbcr' = "
                     "raw subsampled-plane reads of the jpeg fixture (what "
                     "serving streams: no host upsample/convert, half the "
                     "bytes); 'thread_sweep_jpeg' = MEASURED patches/s by "
                     "thread count on this host; 'jpeg240_*' = the REAL "
                     "Aperio tile geometry (240px tiles != 256px patches): "
                     "patch_rgb = per-patch reads paying the ~3.7x tile "
                     "re-decode, mosaic_ycbcr = the serve 'mosaic' path "
                     "(each unique tile decoded once as raw planes, "
                     "assembly on-device); 'jpeg422_ycbcr' = 4:2:2 chroma "
                     "(Aperio GT450) raw planes via the reader's "
                     "libjpeg-direct tile decode"),
        }
        for k in ("jpeg_ycbcr", "thread_sweep_jpeg", "jpeg240_patch_rgb",
                  "jpeg240_mosaic_ycbcr", "jpeg422_ycbcr"):
            if k in results["decode"]:
                v = results["decode"][k]
                out["decode"][k] = round(v, 0) if isinstance(v, float) else v
    if "e2e" in results:
        sph = 3600.0 / results["e2e"]["s_per_slide"]
        out["with_io"] = {
            "metric": "slides_per_hour_e2e_with_io",
            "value": round(sph, 1),
            "unit": ("slides/hour MEASURED wall-clock through "
                     "serve.predict_slides (JPEG-q80 Aperio-layout TIFF "
                     "decode -> raw 4:2:0 YCbCr upload at 1.5 B/px -> "
                     "fused bit-exact reconstruct+screen+featurize resnet "
                     "bf16 -> kmeans100 -> ViS 20820 genes, cross-slide "
                     "pipelined; "
                     f"sandbox h2d relay ~{relay_rate:.1f} MB/s vs ~10-25 "
                     "GB/s PCIe on a real v5e host"
                     + (f"; host decode {results['decode']['jpeg']:.0f} "
                        f"jpeg patches/s on {os.cpu_count()} core(s)"
                        if "decode" in results else "") + ")"),
            "vs_baseline": round(sph / REF_SLIDES_PER_HOUR, 2),
        }
        # h2d accounting so measured-vs-projected is auditable from the
        # artifact alone (VERDICT r4 item 4)
        out["with_io"]["audit"] = results["e2e"]["audit"]
        if "decode" in results and "resnet" in results:
            # same pipeline on a host whose h2d is not the sandbox relay:
            # decode and compute overlap (measured legs), upload rides PCIe.
            # decode rate = raw YCbCr reads of the JPEG layout (what serving
            # streams; falls back to the RGB-path rate when absent); this
            # sandbox has ONE core, so the decode term is a per-core floor —
            # it divides by host cores in production (the unit string says
            # so), with the measured thread sweep recorded under 'decode'
            dec = results["decode"].get("jpeg_ycbcr",
                                        results["decode"]["jpeg"])
            proj = max(PATCHES_PER_SLIDE / dec, results["resnet"])
            out["with_io"]["projected_real_host"] = {
                "value": round(3600.0 / proj, 1),
                "unit": ("slides/hour projected as max(measured 1-core raw-"
                         "YCbCr JPEG decode, measured compute) — what the "
                         "measured wall-clock becomes once h2d is "
                         "PCIe-speed; decode scales per-core (measured "
                         "sweep under 'decode'), so compute-bound "
                         f"({3600.0 / results['resnet']:.0f} slides/h) from "
                         f"~{int(np.ceil((PATCHES_PER_SLIDE / dec) / results['resnet']))} "
                         "host cores up"),
                "vs_baseline": round(3600.0 / proj / REF_SLIDES_PER_HOUR, 2),
            }
    elif isinstance(cached.get("with_io"), dict):
        out["with_io"] = {**cached["with_io"], "cached": True,
                          "cache_reason": failures.get("e2e", "leg skipped")}

    if "e2e_uni" in results:
        sph = 3600.0 / results["e2e_uni"]["s_per_slide"]
        out["with_io_uni"] = {
            "metric": "uni_slides_per_hour_e2e_with_io",
            "value": round(sph, 1),
            "unit": ("slides/hour MEASURED wall-clock through "
                     "serve.predict_slides with the UNI ViT-L/16 backbone "
                     "(JPEG TIFF decode -> raw 4:2:0 YCbCr upload -> fused "
                     "reconstruct+screen+PIL-224-resize+ViT bf16 -> "
                     "kmeans100 -> ViS 20820 genes; "
                     f"sandbox h2d relay ~{relay_rate:.1f} MB/s)"),
            "vs_baseline": round(sph / REF_UNI_SLIDES_PER_HOUR, 2),
        }
        out["with_io_uni"]["audit"] = results["e2e_uni"]["audit"]
        if "decode" in results and "uni" in results:
            dec = results["decode"].get("jpeg_ycbcr",
                                        results["decode"]["jpeg"])
            proj = max(PATCHES_PER_SLIDE / dec, results["uni"])
            out["with_io_uni"]["projected_real_host"] = {
                "value": round(3600.0 / proj, 1),
                "unit": ("slides/hour as max(measured 1-core raw-YCbCr "
                         "decode, measured uni compute) once h2d is "
                         "PCIe-speed; decode scales per-core"),
                "vs_baseline": round(3600.0 / proj / REF_UNI_SLIDES_PER_HOUR,
                                     2),
            }
    elif isinstance(cached.get("with_io_uni"), dict):
        out["with_io_uni"] = {**cached["with_io_uni"], "cached": True,
                              "cache_reason": failures.get("e2e_uni",
                                                           "leg skipped")}

    if "e2e_aperio" in results:
        sph = 3600.0 / results["e2e_aperio"]["s_per_slide"]
        out["with_io_aperio"] = {
            "metric": "slides_per_hour_e2e_with_io_aperio_tiles",
            "value": round(sph, 1),
            "unit": ("slides/hour MEASURED wall-clock through "
                     "serve.predict_slides on 240px-tile fixtures (real "
                     "Aperio SVS tile dims != the 256px patch grid): "
                     "tile-mosaic path — each unique JPEG tile decoded "
                     "once, raw 4:2:0 planes uploaded at 1.5 B/px, patch "
                     "assembly + screening + resnet bf16 fused on-device "
                     "-> kmeans100 -> ViS 20820 genes; "
                     f"sandbox h2d relay ~{relay_rate:.1f} MB/s)"),
            "vs_baseline": round(sph / REF_SLIDES_PER_HOUR, 2),
        }
        out["with_io_aperio"]["audit"] = results["e2e_aperio"]["audit"]
        if "decode" in results and "resnet" in results:
            dec = results["decode"].get(
                "jpeg240_mosaic_ycbcr",
                results["decode"].get("jpeg240_patch_rgb",
                                      results["decode"]["jpeg"]))
            proj = max(PATCHES_PER_SLIDE / dec, results["resnet"])
            out["with_io_aperio"]["projected_real_host"] = {
                "value": round(3600.0 / proj, 1),
                "unit": ("slides/hour as max(measured 1-core mosaic "
                         "tile-decode on 240px tiles, measured compute) "
                         "once h2d is PCIe-speed; decode scales per-core"),
                "vs_baseline": round(3600.0 / proj / REF_SLIDES_PER_HOUR, 2),
            }
    elif isinstance(cached.get("with_io_aperio"), dict):
        out["with_io_aperio"] = {**cached["with_io_aperio"], "cached": True,
                                 "cache_reason": failures.get("e2e_aperio",
                                                              "leg skipped")}

    if failures:
        out["leg_failures"] = failures
    to_cache = {k: ({kk: vv for kk, vv in v.items()
                     if kk not in ("cached", "cache_reason")}
                    if isinstance(v, dict) else v)
                for k, v in out.items()
                if k not in ("leg_failures", "cached", "cache_reason")}
    if not out.get("metric"):
        # headline missing AND no cached headline — but any fresh partial
        # legs (uni/with_io) must be persisted and emitted, not discarded
        fresh = {}
        if "uni" in results and "uni" in to_cache:
            fresh["uni"] = to_cache["uni"]
        if "spatial" in results and "spatial" in to_cache:
            fresh["spatial"] = to_cache["spatial"]
        if "train" in results and "train" in to_cache:
            fresh["train"] = to_cache["train"]
        if "decode" in results and "decode" in to_cache:
            fresh["decode"] = to_cache["decode"]
        if "e2e" in results and "with_io" in to_cache:
            fresh["with_io"] = to_cache["with_io"]
        if "e2e_uni" in results and "with_io_uni" in to_cache:
            fresh["with_io_uni"] = to_cache["with_io_uni"]
        if "e2e_aperio" in results and "with_io_aperio" in to_cache:
            fresh["with_io_aperio"] = to_cache["with_io_aperio"]
        merged = {**cached, **fresh}
        if merged:
            _write_cache(merged)
        _emit_fallback("; ".join(f"{k}: {v}" for k, v in failures.items()),
                       merged)
        return

    _write_cache(to_cache)
    print(json.dumps(out))


def _write_cache(obj: dict) -> None:
    """Atomic cache write: a crash mid-write must not corrupt the last good
    result (the fallback path depends on it)."""
    tmp = CACHE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, CACHE)


def _emit_fallback(reason: str, cached: dict | None = None) -> None:
    """Nothing fresh measured: emit the last good result, flagged."""
    log(f"bench falling back to cache: {reason}")
    if cached is None and os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                cached = json.load(f)
        except Exception:  # noqa: BLE001 — corrupt cache: emit the zero row
            cached = None
    if cached and cached.get("metric"):
        result = dict(cached)
        result["cached"] = True
        result["cache_reason"] = reason
        print(json.dumps(result))
    else:
        row = {"metric": "slides_per_hour_e2e_1chip", "value": 0,
               "unit": "bench failed: " + reason, "vs_baseline": 0}
        if cached:  # no headline, but don't hide partial legs we do have
            row.update({k: cached[k] for k in
                        ("uni", "spatial", "train", "decode", "with_io",
                         "with_io_uni", "with_io_aperio")
                        if k in cached})
        print(json.dumps(row))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        _emit_fallback(f"{type(e).__name__}: {e}")
    # a timed-out leg leaves a daemon thread C-blocked inside the runtime;
    # normal interpreter teardown then dies in native destructors AFTER the
    # JSON line is out ("terminate called ... FATAL: exception not
    # rethrown", rc=134 — observed live on a wedged relay).  The contract
    # is the stdout line, which has been flushed by now — skip teardown.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
