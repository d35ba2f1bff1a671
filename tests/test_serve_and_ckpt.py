"""Serving API + checkpoint-shim tests."""

import os
import sys
import time
import types

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from sequoia_tpu.models import convert, he2rna, resnet, vis
from sequoia_tpu.pipeline.features import FeatureExtractor
from sequoia_tpu.serve import SlidePredictor
from sequoia_tpu.train import checkpoint


def make_predictor(n_folds=2, n_clusters=8):
    extractor = FeatureExtractor("resnet",
                                 resnet.random_params(jax.random.PRNGKey(0)),
                                 batch_size=16, patch_size=64)
    cfg = vis.ViSConfig(num_outputs=5, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=n_clusters)
    models = [(cfg, vis.init(cfg, jax.random.PRNGKey(i)))
              for i in range(n_folds)]
    return SlidePredictor(extractor, models, n_clusters=n_clusters,
                          max_patches=48, patch_size=64)


@pytest.mark.slow
def test_predict_from_patches_and_features():
    rng = np.random.default_rng(0)
    pred = make_predictor()
    patches = rng.integers(0, 256, size=(20, 64, 64, 3), dtype=np.uint8)
    out = pred.predict_patches(patches)
    assert out.shape == (1, 5) and np.isfinite(out).all()

    feats = rng.normal(size=(30, 2048)).astype(np.float32)
    out2 = pred.predict_features(feats)
    assert out2.shape == (1, 5)

    # fold averaging (vmapped stacked path == mean of single-model runs)
    single0 = SlidePredictor(pred.extractor, [pred.vis_models[0]],
                             n_clusters=8).predict_features(feats)
    single1 = SlidePredictor(pred.extractor, [pred.vis_models[1]],
                             n_clusters=8).predict_features(feats)
    np.testing.assert_allclose(out2, (single0 + single1) / 2, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_predict_from_wsi():
    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()
    out = pred.predict_wsi(synthetic_wsi())
    assert out.shape == (1, 5) and np.isfinite(out).all()


def test_whole_module_pickle_shim(tmp_path):
    """Load a reference-style torch.save(model) whole-module pickle without
    the defining module on the path."""
    import torch
    import torch.nn as nn

    mod = types.ModuleType("he2rna_fake_module")

    class HE2RNA(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Conv1d(8, 6, 1)
            self.conv1 = nn.Conv1d(6, 4, 1)

    HE2RNA.__module__ = "he2rna_fake_module"
    HE2RNA.__qualname__ = "HE2RNA"
    mod.HE2RNA = HE2RNA
    sys.modules["he2rna_fake_module"] = mod
    m = HE2RNA()
    path = str(tmp_path / "whole_module.pt")
    torch.save(m, path)
    want = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    del sys.modules["he2rna_fake_module"]  # simulate missing reference code

    sd = checkpoint.load_torch_checkpoint(path)
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k])

    # and it converts into our HE2RNA
    cfg, params = convert.he2rna_from_torch(sd)
    assert cfg.input_dim == 8 and cfg.output_dim == 4 and cfg.layers == (6,)


def test_hf_layout_safetensors_dir(tmp_path):
    """PyTorchModelHubMixin local snapshot with model.safetensors."""
    from safetensors.numpy import save_file

    cfg = vis.ViSConfig(num_outputs=3, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=5)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    sd = {k: np.ascontiguousarray(np.asarray(v))
          for k, v in convert.vis_to_torch(cfg, params).items()}
    save_file(sd, str(tmp_path / "model.safetensors"))

    loaded = checkpoint.load_hf_vis_state_dict(str(tmp_path))
    cfg2, params2 = convert.vis_from_torch(loaded)
    assert cfg2 == cfg
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params2)


def test_tools_convert_weights_roundtrip(tmp_path):
    sys.path.insert(0, "tools")
    import convert_weights as cw

    cfg = vis.ViSConfig(num_outputs=4, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=5)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    src = str(tmp_path / "a.pt")
    checkpoint.save_torch_state_dict(convert.vis_to_torch(cfg, params), src)

    dst = str(tmp_path / "b.pt")
    cw.main(["--model", "vis", "--src", src, "--dst", dst, "--to", "torch"])
    sd2 = checkpoint.load_torch_checkpoint(dst)
    cfg2, params2 = convert.vis_from_torch(sd2)
    assert cfg2 == cfg
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params2)

    cw.main(["--model", "vis", "--src", src, "--dst",
             str(tmp_path / "orb"), "--to", "orbax"])
    restored = checkpoint.load_orbax(str(tmp_path / "orb"), like=params)
    np.testing.assert_array_equal(np.asarray(restored["head_w"]),
                                  np.asarray(params["head_w"]))


def test_tools_parity_check(tmp_path):
    import pickle as pk
    sys.path.insert(0, "tools")
    import parity_check as pc

    rng = np.random.default_rng(0)
    genes = ["A", "B", "C"]
    real = rng.normal(size=(20, 3)).astype(np.float32)
    pred = real + 0.1 * rng.normal(size=(20, 3)).astype(np.float32)
    wsis = np.asarray([f"w{i}" for i in range(20)])

    def dump(path, pred_, order):
        res = {"genes": genes, "split_0": {
            "real": real[order], "preds": pred_[order],
            "random": pred_[order], "wsi_file_name": wsis[order],
            "tcga_project": ["X"] * 20}}
        with open(path, "wb") as f:
            pk.dump(res, f)

    dump(tmp_path / "ref.pkl", pred, np.arange(20))
    # ours: same predictions, shuffled slide order -> must still PASS
    dump(tmp_path / "ours.pkl", pred, rng.permutation(20))
    assert pc.main(["--ref", str(tmp_path / "ref.pkl"),
                    "--ours", str(tmp_path / "ours.pkl")]) == 0

    # perturbed predictions -> FAIL
    dump(tmp_path / "bad.pkl", pred + 0.3 * rng.normal(size=pred.shape).astype(np.float32),
         np.arange(20))
    assert pc.main(["--ref", str(tmp_path / "ref.pkl"),
                    "--ours", str(tmp_path / "bad.pkl")]) == 1


@pytest.mark.slow
def test_predict_wsi_streaming_matches_sequential():
    """The streaming predict_wsi (decode thread + batched featurize with
    whole-batch draining) must equal featurizing extract_patches output."""
    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()
    path = synthetic_wsi()
    streamed = pred.predict_wsi(path)
    sequential = pred.predict_patches(pred.extract_patches(path))
    np.testing.assert_allclose(streamed, sequential, rtol=1e-5, atol=1e-5)


def test_save_hf_vis_layout_roundtrip(tmp_path):
    """save_hf_vis_layout -> load_hf_vis_state_dict -> vis_from_torch
    reproduces the forward; the directory is the PyTorchModelHubMixin
    layout the reference's ViS.from_pretrained consumes."""
    import json

    from sequoia_tpu.models import convert
    from sequoia_tpu.train import checkpoint

    cfg = vis.ViSConfig(num_outputs=7, input_dim=32, depth=2, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=10)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    out = tmp_path / "hf"
    checkpoint.save_hf_vis_layout(str(out), cfg, params)

    conf = json.loads((out / "config.json").read_text())
    assert conf["dimensions_f"] == 4 and conf["num_outputs"] == 7

    sd = checkpoint.load_hf_vis_state_dict(str(out))
    cfg2, params2 = convert.vis_from_torch(sd)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    np.testing.assert_allclose(np.asarray(vis.apply(cfg, params, x)),
                               np.asarray(vis.apply(cfg2, params2, x)),
                               rtol=1e-5, atol=1e-6)


def test_reference_vis_from_pretrained_loads_our_export(tmp_path):
    """The reference's own ViS.from_pretrained opens our exported dir."""
    import sys

    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("no reference checkout")
    from sequoia_tpu.train import checkpoint

    cfg = vis.ViSConfig(num_outputs=7, input_dim=32, depth=2, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=10)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    out = tmp_path / "hf"
    checkpoint.save_hf_vis_layout(str(out), cfg, params)

    sys.path.insert(0, ref_src)
    try:
        import torch
        from tformer_lin import ViS as RefViS

        model = RefViS.from_pretrained(str(out), device="cpu")
        model.eval()
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32)),
                       np.float32)
        with torch.no_grad():
            ref_out = model(torch.from_numpy(x)).numpy()
        ours = np.asarray(vis.apply(cfg, params, jax.numpy.asarray(x)))
        np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)
    finally:
        sys.path.remove(ref_src)


def test_reference_he2rna_from_pretrained_loads_our_export(tmp_path):
    """The reference's HE2RNA.from_pretrained opens our exported dir with
    eval-forward parity (all-ks averaging path)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import reference_loader as rl

    if not rl.reference_available():
        pytest.skip("no reference checkout")
    ref = rl.load_reference()
    from sequoia_tpu.models import he2rna as ours_mod
    from sequoia_tpu.train import checkpoint

    cfg = ours_mod.HE2RNAConfig(input_dim=16, output_dim=5, layers=(8,),
                                ks=(1, 2, 3))
    params = ours_mod.init(cfg, jax.random.PRNGKey(0))
    out = tmp_path / "hf"
    checkpoint.save_hf_he2rna_layout(str(out), cfg, params)

    import torch

    model = ref.he2rna.HE2RNA.from_pretrained(str(out))
    model.eval()
    x = np.abs(np.asarray(jax.random.normal(jax.random.PRNGKey(1),
                                            (2, 6, 16)), np.float32))
    # reference forward wants (B, F, T)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    got = np.asarray(ours_mod.apply(cfg, params, jax.numpy.asarray(x),
                                    train=False))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_predict_slides_pipelined_matches_predict_wsi():
    """Cross-slide pipelining (slide i+1 decodes while slide i computes)
    must yield the same per-slide predictions, in order."""
    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()
    slides = [synthetic_wsi(seed=s) for s in (0, 1, 2)]
    want = [pred.predict_wsi(s) for s in slides]
    got = list(pred.predict_slides(slides))
    assert [id(p) for p, _ in got] == [id(s) for s in slides]
    for (_, g), w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)


def test_predict_slides_quarantine_and_no_stranded_threads():
    """A failing slide mid-stream is quarantined via on_error; later slides
    still serve and every decode thread joins."""
    import threading

    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()
    good = [synthetic_wsi(seed=0), synthetic_wsi(seed=1)]
    n0 = threading.active_count()
    failures = []
    got = list(pred.predict_slides(
        [good[0], "/nonexistent/slide.svs", good[1]],
        on_error=lambda p, e: failures.append(p)))
    assert [id(p) for p, _ in got] == [id(g) for g in good]
    assert failures == ["/nonexistent/slide.svs"]
    assert threading.active_count() == n0

    # without on_error the failure propagates and the lookahead joins too
    with pytest.raises(Exception):
        list(pred.predict_slides(["/nonexistent/slide.svs", good[0]]))
    assert threading.active_count() == n0


def test_predict_slides_raising_on_error_reaps_lookahead():
    """If the caller's on_error callback itself raises, the prefetched
    lookahead producer must still be terminated (regression: the
    producer-handoff was skipped on that path and the thread spun on its
    bounded queue forever)."""
    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()
    started = []
    orig = pred._start_producer

    def tracking_start(path):
        tup = orig(path)
        started.append(tup)
        return tup

    pred._start_producer = tracking_start
    slides = ["/nonexistent/slide.svs", synthetic_wsi(seed=0)]

    def bad_on_error(path, exc):
        raise RuntimeError("logging bug in the quarantine callback")

    with pytest.raises(RuntimeError, match="logging bug"):
        list(pred.predict_slides(slides, on_error=bad_on_error))

    assert len(started) == 2  # slide 1 + the prefetched slide 2
    for tup in started:
        tup[1].join(timeout=60)
        assert not tup[1].is_alive(), "lookahead decode thread stranded"


def test_predict_wsi_early_cap_with_slow_producer_terminates():
    """Early patch-cap stop while the decode producer is mid-chunk (queue
    empty) must not deadlock _consume: the producer's gated sentinel put is
    refused once stop is set, so the consumer has to check stop before
    blocking in q.get() (regression: this hung forever)."""
    import threading
    import time

    from sequoia_tpu.data.wsi import ArrayReader

    pred = make_predictor()  # max_patches=48, batch 16

    rng = np.random.default_rng(0)

    def tissue_chunk(n):
        c = np.empty((n, 64, 64, 3), np.uint8)
        c[..., 0] = rng.integers(150, 220, c.shape[:3])
        c[..., 1] = rng.integers(60, 140, c.shape[:3])
        c[..., 2] = rng.integers(150, 230, c.shape[:3])
        return c

    def slow_raw_chunks(slide, decode_chunk=64, stop=None):
        yield tissue_chunk(64)  # >= max_patches of obvious tissue
        # consumer hits the cap and sets stop while we're "decoding"
        time.sleep(2.0)
        yield tissue_chunk(64)

    pred.iter_raw_chunks = slow_raw_chunks
    reader = ArrayReader([np.zeros((256, 256, 3), np.uint8)],
                         properties={"aperio.AppMag": "20"})

    result = []
    worker = threading.Thread(
        target=lambda: result.append(pred.predict_wsi(reader)), daemon=True)
    worker.start()
    worker.join(timeout=120)
    assert not worker.is_alive(), "predict_wsi deadlocked after early cap"
    assert result and result[0].shape == (1, 5)
    assert np.isfinite(result[0]).all()


def test_predict_slides_abandoned_generator_reaps_lookahead():
    """Breaking out of predict_slides mid-iteration must terminate the
    prefetched lookahead decode thread (regression: it spun on its bounded
    queue for the rest of the process)."""
    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()
    started = []
    orig = pred._start_producer

    def tracking_start(path):
        tup = orig(path)
        started.append(tup)
        return tup

    pred._start_producer = tracking_start
    slides = [synthetic_wsi(seed=0), synthetic_wsi(seed=1),
              synthetic_wsi(seed=2)]
    for _path, out in pred.predict_slides(slides):
        assert np.isfinite(out).all()
        break  # abandon with the slide-2 lookahead running

    assert len(started) == 2  # slide 1 + the prefetched slide 2
    for tup in started:
        tup[1].join(timeout=60)
        assert not tup[1].is_alive(), "lookahead decode thread stranded"


def test_predict_wsi_uni_backbone_end_to_end():
    """The uni serving path (fused screen + bit-exact PIL 224 resize +
    ViT in one program) through predict_wsi on a synthetic WSI, small ViT
    config for CPU speed; fused result == sequential screened extraction."""
    from tests.test_pipeline_e2e import synthetic_wsi

    from sequoia_tpu.models import uni_vit

    ucfg = uni_vit.UniViTConfig(img_size=32, patch_size=16, dim=24, depth=2,
                                heads=2, mlp_dim=32)
    uparams = uni_vit.random_params(ucfg, jax.random.PRNGKey(0))
    extractor = FeatureExtractor("uni", uparams, batch_size=16, cfg=ucfg,
                                 patch_size=64)
    cfg = vis.ViSConfig(num_outputs=5, input_dim=24, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    pred = SlidePredictor(extractor, [(cfg, vis.init(cfg, jax.random.PRNGKey(1)))],
                          n_clusters=8, max_patches=48, patch_size=64)
    path = synthetic_wsi()
    streamed = pred.predict_wsi(path)
    sequential = pred.predict_patches(pred.extract_patches(path))
    assert streamed.shape == (1, 5) and np.isfinite(streamed).all()
    np.testing.assert_allclose(streamed, sequential, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_cli_serve_uni_end_to_end(tmp_path, monkeypatch):
    """serve CLI with --feat_type uni: synthetic WSI -> predictions through
    the REAL ViT-L/16 architecture (random weights) + a 1024-d ViS head."""
    import pickle

    from sequoia_tpu.cli import serve as cli_serve
    from sequoia_tpu.models import convert

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")
    from tests.test_pipeline_e2e import synthetic_wsi

    monkeypatch.chdir(tmp_path)
    slide = synthetic_wsi()
    native.write_tiled_tiff("slide1.tiff", [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))

    genes = [f"G{i}" for i in range(4)]
    ckpt_dir = tmp_path / "exp"
    ckpt_dir.mkdir()
    cfg = vis.ViSConfig(num_outputs=4, input_dim=1024, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    checkpoint.save_torch_state_dict(
        convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(0))),
        str(ckpt_dir / "model_best_0.pt"))
    with open(ckpt_dir / "test_results.pkl", "wb") as f:
        pickle.dump({"genes": genes}, f)

    cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints", str(ckpt_dir),
                    "--feat_type", "uni", "--weights", "random",
                    "--batch_size", "8", "--compute_dtype", "float32",
                    "--max_patches", "16", "--patch_size", "64",
                    "--num_clusters", "8", "--out", "preds.csv"])
    out = pd.read_csv("preds.csv", index_col=0)
    assert list(out.columns) == genes
    assert np.isfinite(out.to_numpy()).all()


@pytest.mark.slow
def test_predict_wsi_consumer_failure_does_not_strand_producer():
    """If featurization raises mid-stream, predict_wsi must propagate the
    error promptly and terminate the decode thread (no stuck q.put)."""
    import threading

    from tests.test_pipeline_e2e import synthetic_wsi

    pred = make_predictor()

    class Boom(RuntimeError):
        pass

    def _boom(*a, **k):
        raise Boom("backbone OOM")

    class FailingExtractor:
        batch_size = 8
        feature_dim = pred.extractor.feature_dim
        params = None
        raw_fwd = staticmethod(_boom)  # fused path traces this
        upload = staticmethod(jnp.asarray)  # host->device layout hook
        __call__ = _boom  # screened path calls this

    pred.extractor = FailingExtractor()
    n0 = threading.active_count()
    with pytest.raises(Boom):
        pred.predict_wsi(synthetic_wsi())
    # producer thread joined: thread count back to baseline
    assert threading.active_count() == n0


@pytest.mark.slow
def test_slice_head_matches_full_output_columns():
    """Panel serving: slicing the ViS head == selecting the full output's
    columns (a linear head commutes with output selection; equality is up
    to XLA's matmul reduction order, which differs between a (D, P) and a
    (D, G) head)."""
    cfg = vis.ViSConfig(num_outputs=11, input_dim=32, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 8, 32)),
                    jnp.float32)
    full = vis.apply(cfg, params, x)
    idx = [7, 0, 10]
    pcfg, pparams = vis.slice_head(cfg, params, idx)
    assert pcfg.num_outputs == 3
    np.testing.assert_allclose(np.asarray(full)[:, idx],
                               np.asarray(vis.apply(pcfg, pparams, x)),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):
        vis.slice_head(cfg, params, [])


def test_cli_serve_end_to_end(tmp_path, monkeypatch):
    """serve CLI: synthetic WSI -> predictions.csv through a 2-fold CV dir,
    gene names from test_results.pkl."""
    import pickle

    from sequoia_tpu.cli import serve as cli_serve
    from sequoia_tpu.models import convert
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    slide = synthetic_wsi()
    native.write_tiled_tiff("slide1.tiff", [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))

    genes = [f"G{i}" for i in range(5)]
    ckpt_dir = tmp_path / "exp"
    ckpt_dir.mkdir()
    cfg = vis.ViSConfig(num_outputs=5, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    for i in range(2):
        checkpoint.save_torch_state_dict(
            convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(i))),
            str(ckpt_dir / f"model_best_{i}.pt"))
    with open(ckpt_dir / "test_results.pkl", "wb") as f:
        pickle.dump({"genes": genes}, f)

    cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints", str(ckpt_dir),
                    "--weights", "random", "--batch_size", "16",
                    "--compute_dtype", "float32", "--max_patches", "48",
                    "--patch_size", "64", "--num_clusters", "8",
                    "--out", "preds.csv"])
    out = pd.read_csv("preds.csv", index_col=0)
    assert list(out.columns) == genes
    assert out.shape == (1, 5) and np.isfinite(out.to_numpy()).all()

    # comma-form gene names (sibling-CLI convention)
    cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints", str(ckpt_dir),
                    "--weights", "random", "--batch_size", "16",
                    "--compute_dtype", "float32", "--max_patches", "48",
                    "--patch_size", "64", "--num_clusters", "8",
                    "--gene_names", ",".join(genes), "--out", "preds2.csv"])
    assert list(pd.read_csv("preds2.csv", index_col=0).columns) == genes

    # duplicate --wsi paths dedup (would silently collapse to one row
    # after running the pipeline twice)
    cli_serve.main(["--wsi", "slide1.tiff", "slide1.tiff",
                    "--checkpoints", str(ckpt_dir),
                    "--weights", "random", "--batch_size", "16",
                    "--compute_dtype", "float32", "--max_patches", "48",
                    "--patch_size", "64", "--num_clusters", "8",
                    "--out", "dup.csv"])
    assert len(pd.read_csv("dup.csv", index_col=0)) == 1

    # gene-panel serving: head sliced to the panel; values match the
    # corresponding columns of the full run
    cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints", str(ckpt_dir),
                    "--weights", "random", "--batch_size", "16",
                    "--compute_dtype", "float32", "--max_patches", "48",
                    "--patch_size", "64", "--num_clusters", "8",
                    "--panel", "G3,G1", "--out", "panel.csv"])
    panel = pd.read_csv("panel.csv", index_col=0)
    assert list(panel.columns) == ["G3", "G1"]
    np.testing.assert_allclose(panel.to_numpy(),
                               out[["G3", "G1"]].to_numpy(),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(SystemExit, match="not in the model's gene list"):
        cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints",
                        str(ckpt_dir), "--weights", "random",
                        "--batch_size", "16", "--compute_dtype", "float32",
                        "--max_patches", "48", "--patch_size", "64",
                        "--num_clusters", "8", "--panel", "NOPE",
                        "--out", "panel2.csv"])

    # config mismatch -> upfront error, not per-slide failures
    with pytest.raises(SystemExit, match="num_clusters"):
        cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints",
                        str(ckpt_dir), "--weights", "random",
                        "--num_clusters", "100"])

    # all slides failing -> nonzero exit
    with pytest.raises(SystemExit, match="failed"):
        cli_serve.main(["--wsi", "does-not-exist.tiff", "--checkpoints",
                        str(ckpt_dir), "--weights", "random",
                        "--batch_size", "16", "--compute_dtype", "float32",
                        "--max_patches", "48", "--patch_size", "64",
                        "--num_clusters", "8", "--out", "preds3.csv"])


def test_http_serving_end_to_end(tmp_path):
    """Resident HTTP server: /healthz, /genes, /predict against a synthetic
    WSI match the in-process predictor; bad requests and unreadable slides
    degrade to structured errors without killing the server."""
    import json
    import threading
    import urllib.request

    from sequoia_tpu import http_serve
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    slide = synthetic_wsi()
    wsi_path = str(tmp_path / "s1.tiff")
    native.write_tiled_tiff(wsi_path, [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))

    pred = make_predictor()
    genes = [f"G{i}" for i in range(5)]
    direct = pred.predict_wsi(wsi_path)

    srv = http_serve.make_server(http_serve.PredictorService(pred, genes),
                                 port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % srv.server_address[1]
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert {k: h[k] for k in ("status", "folds", "feat_type",
                                  "genes")} == {
            "status": "ok", "folds": 2, "feat_type": "resnet", "genes": 5}
        assert h["requests"] == 0 and h["slides_ok"] == 0
        with urllib.request.urlopen(base + "/genes", timeout=30) as r:
            assert json.loads(r.read())["genes"] == genes

        def post(path, obj):
            req = urllib.request.Request(
                base + path, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post("/predict", {"wsi": wsi_path})
        assert code == 200 and list(out["predictions"]) == [wsi_path]
        np.testing.assert_allclose(
            [out["predictions"][wsi_path][g] for g in genes],
            direct[0], rtol=1e-5, atol=1e-6)
        assert out["failed"] == {}

        code, out = post("/predict", {"nope": 1})
        assert code == 400 and "error" in out
        code, out = post("/predict", {"wsi": str(tmp_path / "missing.tiff")})
        assert code == 502 and out["predictions"] == {} and len(out["failed"]) == 1

        # server survives the failures: healthz still answers, and the
        # counters reflect the /predict calls above
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["requests"] == 2  # the 400 never reached the predictor
        assert h["slides_ok"] == 1 and h["slides_failed"] == 1
        assert h["last_slide_seconds"] > 0
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_serving_concurrent_requests(tmp_path):
    """Two simultaneous /predict requests serialize behind the predictor
    lock and both return correct results (ThreadingHTTPServer handles each
    request on its own thread)."""
    import json
    import threading
    import urllib.request

    from sequoia_tpu import http_serve
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    slide = synthetic_wsi()
    wsi_path = str(tmp_path / "s1.tiff")
    native.write_tiled_tiff(wsi_path, [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))

    pred = make_predictor()
    genes = [f"G{i}" for i in range(5)]
    direct = pred.predict_wsi(wsi_path)
    srv = http_serve.make_server(http_serve.PredictorService(pred, genes),
                                 port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % srv.server_address[1]

    results = [None, None]

    def hit(i):
        req = urllib.request.Request(
            base + "/predict",
            data=json.dumps({"wsi": wsi_path}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            results[i] = json.loads(r.read())

    try:
        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        [t.start() for t in ts]
        [t.join(timeout=600) for t in ts]
        for out in results:
            assert out is not None and out["failed"] == {}
            np.testing.assert_allclose(
                [out["predictions"][wsi_path][g] for g in genes],
                direct[0], rtol=1e-5, atol=1e-6)
    finally:
        srv.shutdown()
        srv.server_close()


def test_slice_head_rejects_out_of_range():
    cfg = vis.ViSConfig(num_outputs=5, input_dim=16, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=4)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="out of range"):
        vis.slice_head(cfg, params, [0, 5])
    with pytest.raises(ValueError, match="out of range"):
        vis.slice_head(cfg, params, [-1])


def test_multi_model_serving_vit_and_he2rna():
    """SlidePredictor(model_type=...) serves ViT and HE2RNA fold ensembles:
    vmapped-stacked fold mean == hand-computed per-fold mean, with the
    reference's predict-time ReLU for he2rna (he2rna.py:175-190)."""
    from sequoia_tpu.models import vit as vit_mod

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(30, 64)).astype(np.float32)

    extractor = FeatureExtractor(
        "resnet", resnet.random_params(jax.random.PRNGKey(0)),
        batch_size=16, patch_size=64)

    vcfg = vit_mod.ViTConfig(num_outputs=5, dim=64, depth=1,
                             heads=2, dim_head=4, mlp_dim=8, num_clusters=8)
    vmodels = [(vcfg, vit_mod.init(vcfg, jax.random.PRNGKey(i)))
               for i in range(2)]
    pred = SlidePredictor(extractor, vmodels, model_type="vit",
                          n_clusters=8, max_patches=48, patch_size=64)
    got = pred.predict_features(feats)
    cf = pred.cluster(feats)[None]
    want = np.mean([np.asarray(vit_mod.apply(c, p, cf))
                    for c, p in vmodels], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    hcfg = he2rna.HE2RNAConfig(input_dim=64, output_dim=5, layers=(8,),
                               ks=(1, 2, 5))
    hmodels = [(hcfg, he2rna.init(hcfg, jax.random.PRNGKey(i)))
               for i in range(2)]
    hpred = SlidePredictor(extractor, hmodels, model_type="he2rna",
                           n_clusters=8, max_patches=48, patch_size=64)
    hgot = hpred.predict_features(feats)
    hwant = np.mean([np.maximum(np.asarray(
        he2rna.apply(c, p, cf, train=False)), 0) for c, p in hmodels], axis=0)
    np.testing.assert_allclose(hgot, hwant, rtol=1e-5, atol=1e-5)
    assert (hgot >= 0).all()  # predict-time ReLU applied

    # heterogeneous-config fold list exercises the per-model path
    hcfg2, hp2 = he2rna.replace_head(hcfg, hmodels[0][1], 5,
                                     jax.random.PRNGKey(9))
    hpred2 = SlidePredictor(extractor, [hmodels[0], (hcfg, hmodels[1][1]),
                                        (hcfg2, hp2)],
                            model_type="he2rna", n_clusters=8,
                            max_patches=48, patch_size=64)
    assert hpred2.predict_features(feats).shape == (1, 5)


def test_he2rna_and_vit_slice_head_match_full_columns():
    from sequoia_tpu.models import vit as vit_mod

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 24)), jnp.float32)

    vcfg = vit_mod.ViTConfig(num_outputs=9, dim=24, depth=1,
                             heads=2, dim_head=4, mlp_dim=8, num_clusters=8)
    vp = vit_mod.init(vcfg, jax.random.PRNGKey(0))
    full = np.asarray(vit_mod.apply(vcfg, vp, x))
    scfg, sp = vit_mod.slice_head(vcfg, vp, [8, 2])
    np.testing.assert_allclose(full[:, [8, 2]],
                               np.asarray(vit_mod.apply(scfg, sp, x)),
                               rtol=1e-6, atol=1e-6)

    hcfg = he2rna.HE2RNAConfig(input_dim=24, output_dim=9, layers=(8,),
                               ks=(1, 2, 5))
    hp = he2rna.init(hcfg, jax.random.PRNGKey(1))
    hfull = np.asarray(he2rna.apply(hcfg, hp, x, train=False))
    hscfg, hsp = he2rna.slice_head(hcfg, hp, [8, 2])
    np.testing.assert_allclose(hfull[:, [8, 2]],
                               np.asarray(he2rna.apply(hscfg, hsp, x,
                                                       train=False)),
                               rtol=1e-6, atol=1e-6)


def test_cli_serve_he2rna_end_to_end(tmp_path, monkeypatch):
    """serve CLI with --model_type he2rna: CV-dir model_{i}.pt state dicts
    (the reference's he2rna fold layout), predict-time ReLU, panel slicing."""
    from sequoia_tpu.cli import serve as cli_serve
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    slide = synthetic_wsi()
    native.write_tiled_tiff("slide1.tiff", [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))

    genes = [f"G{i}" for i in range(4)]
    ckpt_dir = tmp_path / "exp_he2rna"
    ckpt_dir.mkdir()
    hcfg = he2rna.HE2RNAConfig(input_dim=2048, output_dim=4, layers=(8,),
                               ks=(1, 2, 5))
    for i in range(2):
        checkpoint.save_torch_state_dict(
            convert.he2rna_to_torch(hcfg, he2rna.init(hcfg,
                                                      jax.random.PRNGKey(i))),
            str(ckpt_dir / f"model_{i}.pt"))

    base = ["--wsi", "slide1.tiff", "--checkpoints", str(ckpt_dir),
            "--model_type", "he2rna", "--weights", "random",
            "--batch_size", "16", "--compute_dtype", "float32",
            "--max_patches", "48", "--patch_size", "64",
            "--num_clusters", "8", "--gene_names", ",".join(genes)]
    cli_serve.main(base + ["--out", "he.csv"])
    out = pd.read_csv("he.csv", index_col=0)
    assert list(out.columns) == genes and out.shape == (1, 4)
    assert (out.to_numpy() >= 0).all()  # predict-time ReLU

    cli_serve.main(base + ["--panel", "G2,G0", "--out", "hep.csv"])
    panel = pd.read_csv("hep.csv", index_col=0)
    assert list(panel.columns) == ["G2", "G0"]
    np.testing.assert_allclose(panel.to_numpy(),
                               out[["G2", "G0"]].to_numpy(),
                               rtol=1e-5, atol=1e-6)


def test_cli_serve_vit_end_to_end(tmp_path, monkeypatch):
    """serve CLI with --model_type vit (token dim == feature dim check,
    model_best_{i}.pt discovery shared with vis)."""
    from sequoia_tpu.cli import serve as cli_serve
    from sequoia_tpu.models import vit as vit_mod
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    slide = synthetic_wsi()
    native.write_tiled_tiff("slide1.tiff", [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))

    ckpt_dir = tmp_path / "exp_vit"
    ckpt_dir.mkdir()
    vcfg = vit_mod.ViTConfig(num_outputs=3, dim=2048, depth=1, heads=2,
                             dim_head=4, mlp_dim=8, num_clusters=8)
    checkpoint.save_torch_state_dict(
        convert.vit_to_torch(vcfg, vit_mod.init(vcfg, jax.random.PRNGKey(0))),
        str(ckpt_dir / "model_best_0.pt"))

    cli_serve.main(["--wsi", "slide1.tiff", "--checkpoints", str(ckpt_dir),
                    "--model_type", "vit", "--weights", "random",
                    "--batch_size", "16", "--compute_dtype", "float32",
                    "--max_patches", "48", "--patch_size", "64",
                    "--num_clusters", "8", "--gene_names", "A,B,C",
                    "--out", "vit.csv"])
    out = pd.read_csv("vit.csv", index_col=0)
    assert list(out.columns) == ["A", "B", "C"]
    assert np.isfinite(out.to_numpy()).all()


def test_cli_serve_profile_writes_trace(tmp_path, monkeypatch):
    """--profile DIR captures a jax.profiler trace of the one-shot run."""
    from sequoia_tpu.cli import serve as cli_serve
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    slide = synthetic_wsi()
    native.write_tiled_tiff("s.tiff", [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))
    ckpt = tmp_path / "exp"
    ckpt.mkdir()
    cfg = vis.ViSConfig(num_outputs=3, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    checkpoint.save_torch_state_dict(
        convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(0))),
        str(ckpt / "model_best_0.pt"))
    cli_serve.main(["--wsi", "s.tiff", "--checkpoints", str(ckpt),
                    "--weights", "random", "--batch_size", "16",
                    "--compute_dtype", "float32", "--max_patches", "48",
                    "--patch_size", "64", "--num_clusters", "8",
                    "--gene_names", "A,B,C", "--profile",
                    str(tmp_path / "tr"), "--out", "p.csv"])
    traces = [f for _, _, fs in os.walk(tmp_path / "tr") for f in fs
              if f.endswith((".pb", ".json.gz"))]
    assert traces, "no trace artifacts under --profile dir"


def test_cli_serve_compilation_cache_populates(tmp_path, monkeypatch):
    """--compilation_cache DIR plumbs through to jax.config (under pytest
    the conftest cache is already warm, so executables load as cache hits
    and are not re-written — the 2.8x cold/warm restart effect is measured
    out-of-process; here we pin the config wiring and that the run still
    works)."""
    from sequoia_tpu.cli import serve as cli_serve
    from tests.test_pipeline_e2e import synthetic_wsi

    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native tiff reader unavailable")

    monkeypatch.chdir(tmp_path)
    slide = synthetic_wsi()
    native.write_tiled_tiff("s.tiff", [slide.levels[0], slide.levels[1]],
                            tile=(128, 128))
    ckpt = tmp_path / "exp"
    ckpt.mkdir()
    cfg = vis.ViSConfig(num_outputs=3, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    checkpoint.save_torch_state_dict(
        convert.vis_to_torch(cfg, vis.init(cfg, jax.random.PRNGKey(0))),
        str(ckpt / "model_best_0.pt"))
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        cli_serve.main(["--wsi", "s.tiff", "--checkpoints", str(ckpt),
                        "--weights", "random", "--batch_size", "16",
                        "--compute_dtype", "float32", "--max_patches", "48",
                        "--patch_size", "64", "--num_clusters", "8",
                        "--gene_names", "A,B,C",
                        "--compilation_cache", str(tmp_path / "cc"),
                        "--out", "p.csv"])
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        assert os.path.exists("p.csv")
    finally:  # the CLI sets process-global config; undo for later tests
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


def test_he2rna_empty_ks_clamp_raises():
    """ks all above the serving token count must error, not silently
    predict zeros (he2rna.apply sums over cfg.ks)."""
    extractor = FeatureExtractor(
        "resnet", resnet.random_params(jax.random.PRNGKey(0)),
        batch_size=16, patch_size=64)
    hcfg = he2rna.HE2RNAConfig(input_dim=2048, output_dim=3, layers=(8,),
                               ks=(50, 100))
    with pytest.raises(ValueError, match="exceed n_clusters"):
        SlidePredictor(extractor,
                       [(hcfg, he2rna.init(hcfg, jax.random.PRNGKey(0)))],
                       model_type="he2rna", n_clusters=8)


def test_http_predict_rejects_non_object_bodies():
    """Valid-JSON non-dict bodies (list/str/number/null) get a 400, not a
    dropped connection from an uncaught AttributeError."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from sequoia_tpu import http_serve

    pred = make_predictor()
    srv = http_serve.make_server(
        http_serve.PredictorService(pred, [f"G{i}" for i in range(5)]),
        port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % srv.server_address[1]
    try:
        for body in ('["x.svs"]', '"x.svs"', "123", "null"):
            req = urllib.request.Request(
                base + "/predict", data=body.encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400
            assert "error" in json.loads(e.value.read())
    finally:
        srv.shutdown()
        srv.server_close()


def test_tools_bench_serving_smoke(capsys):
    """tools/bench_serving.py prints one valid JSON line with both legs."""
    import json

    sys.path.insert(0, "tools")
    import bench_serving

    bench_serving.main(["--genes", "64", "--panel", "8", "--reps", "2",
                        "--input_dim", "32", "--folds", "2"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["full_head"]["genes"] == 64 and out["panel"]["genes"] == 8
    assert out["full_head"]["ms"] > 0 and out["panel"]["ms"] > 0


def test_small_slide_fewer_patches_than_clusters_is_finite(capsys):
    """A biopsy-scale slide (kept patches < n_clusters) must produce FINITE
    predictions: empty clusters zero-pad (the reference's <100-token window
    semantics) instead of leaking NaN through the token mean."""
    rng = np.random.default_rng(0)
    pred = make_predictor(n_clusters=8)
    feats = rng.normal(size=(5, 2048)).astype(np.float32)  # 5 < 8
    out = pred.predict_features(feats)
    assert out.shape == (1, 5) and np.isfinite(out).all()


def test_zero_patch_slide_raises_clear_error():
    pred = make_predictor(n_clusters=8)
    with pytest.raises(ValueError, match="no tissue patches"):
        pred.predict_features(np.zeros((0, 2048), np.float32))


def test_http_nan_predictions_serialize_as_null():
    """Non-finite gene values become JSON null (json.dumps would emit a
    literal NaN token that strict parsers reject wholesale)."""
    import json
    import threading
    import urllib.request

    from sequoia_tpu import http_serve

    class FakePredictor:
        vis_models = [None]

        class extractor:
            feat_type = "resnet"

        @staticmethod
        def predict_slides(paths, on_error=None):
            for p in paths:
                yield p, np.asarray([[1.0, np.nan, np.inf]])

    svc = http_serve.PredictorService(FakePredictor(), ["A", "B", "C"])
    srv = http_serve.make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % srv.server_address[1]
    try:
        req = urllib.request.Request(
            base + "/predict", data=json.dumps({"wsi": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            body = r.read().decode()
        assert "NaN" not in body and "Infinity" not in body
        out = json.loads(body)  # strict parse succeeds
        assert out["predictions"]["x"] == {"A": 1.0, "B": None, "C": None}

        # bad Content-Length -> 413, not a hung read
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1",
                                          srv.server_address[1], timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_backpressure_and_timeout():
    """Load behavior under a stalled pipeline: admitted-but-unfinished
    slides past ``max_pending_slides`` get 429 (not an unbounded queue), a
    timed-out client gets RequestTimeout/504 and its still-queued work is
    skipped, and /healthz exposes the live pending counter."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from sequoia_tpu import http_serve

    release = threading.Event()
    started = threading.Event()
    served_paths: list[str] = []

    class SlowPredictor:
        vis_models = [None]

        class extractor:
            feat_type = "resnet"

        @staticmethod
        def predict_slides(paths, on_error=None):
            started.set()
            release.wait(60)
            for p in paths:
                served_paths.append(p)
                yield p, np.asarray([[1.0]])

    svc = http_serve.PredictorService(SlowPredictor(), ["A"],
                                      max_pending_slides=3)
    srv = http_serve.make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % srv.server_address[1]

    def post(wsi, timeout=30):
        req = urllib.request.Request(
            base + "/predict", data=json.dumps({"wsi": wsi}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read().decode())

    results: dict = {}
    try:
        # client A: one slide IN FLIGHT (worker blocked on `release`)
        ta = threading.Thread(
            target=lambda: results.update(a=post("s1")), daemon=True)
        ta.start()
        assert started.wait(30)
        # client B: one slide QUEUED behind the stall (pending = 2)
        tb = threading.Thread(
            target=lambda: results.update(b=post("s2")), daemon=True)
        tb.start()
        deadline = time.monotonic() + 30
        while svc.health()["pending_slides"] < 2:
            assert time.monotonic() < deadline
            time.sleep(0.01)
        # client C: admitted (pending = 3 = cap) but gives up after 0.2 s
        with pytest.raises(http_serve.RequestTimeout):
            svc.predict(["s3"], timeout=0.2)
        # client D: over the cap -> immediate 429, queue never grows
        with pytest.raises(urllib.error.HTTPError) as exc:
            post("s4")
        assert exc.value.code == 429
        h = svc.health()
        assert h["pending_slides"] == 3 and h["max_pending_slides"] == 3
        assert h["rejected"] == 1 and h["timed_out"] == 1

        release.set()  # un-stall the pipeline
        ta.join(30)
        tb.join(30)
        assert results["a"][0] == 200 and "s1" in results["a"][1]["predictions"]
        assert results["b"][0] == 200 and "s2" in results["b"][1]["predictions"]
        # the abandoned request's slide was skipped, not computed
        assert "s3" not in served_paths
        deadline = time.monotonic() + 30
        while svc.health()["pending_slides"] != 0:
            assert time.monotonic() < deadline
            time.sleep(0.01)
        assert svc.health()["slides_ok"] == 2
    finally:
        release.set()
        srv.shutdown()
        srv.server_close()


def test_he2rna_whole_module_pickle_preserves_ks(tmp_path):
    """The reference's torch.save(model) pickles carry model.ks; a model
    trained with a non-default sweep must eval with ITS sweep (the state
    dict alone cannot recover it)."""
    import torch
    import torch.nn as nn

    class HE2RNA(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Conv1d(8, 6, 1)
            self.conv1 = nn.Conv1d(6, 4, 1)
            self.ks = [10]  # the reference ctor default, NOT the CLI sweep

    mod = types.ModuleType("he2rna_ks_module")
    HE2RNA.__module__ = "he2rna_ks_module"
    HE2RNA.__qualname__ = "HE2RNA"
    mod.HE2RNA = HE2RNA
    sys.modules["he2rna_ks_module"] = mod
    try:
        m = HE2RNA()
        path = str(tmp_path / "whole.pt")
        torch.save(m, path)
    finally:
        del sys.modules["he2rna_ks_module"]
    sd = checkpoint.load_torch_checkpoint(path)
    cfg, params = convert.he2rna_from_torch(sd)
    assert cfg.ks == (10,)
    assert cfg.input_dim == 8 and cfg.output_dim == 4


def _slow_fake_predictor(calls, per_slide=0.08, per_run=0.25):
    """A predictor whose predict_slides records each run's path tuple and
    simulates pipeline time: per_run fixed overhead + per_slide each."""
    import time as _time

    class FakePredictor:
        vis_models = [None]

        class extractor:
            feat_type = "resnet"

        @staticmethod
        def predict_slides(paths, on_error=None):
            calls.append(tuple(paths))
            _time.sleep(per_run)
            for p in paths:
                _time.sleep(per_slide)
                if "bad" in p:
                    if on_error is None:
                        raise RuntimeError("boom")
                    on_error(p, RuntimeError("boom"))
                    continue
                yield p, np.asarray([[1.0, 2.0, 3.0]])

    return FakePredictor()


def test_http_concurrent_requests_merge_into_one_run():
    """4 concurrent clients reach ~batch throughput: while one run is in
    flight, everything that queues behind it merges into ONE follow-up
    predict_slides call (duplicate paths compute once), instead of 4
    serial pipeline runs."""
    import threading
    import time as _time

    from sequoia_tpu import http_serve

    calls: list[tuple] = []
    svc = http_serve.PredictorService(
        _slow_fake_predictor(calls), ["A", "B", "C"])
    try:
        # occupy the worker so the concurrent burst queues behind it
        warm = threading.Thread(target=svc.predict, args=(["warm.svs"],))
        warm.start()
        _time.sleep(0.1)  # worker is inside the warm run's sleep

        outs: dict[str, tuple] = {}

        def client(name, paths):
            outs[name] = svc.predict(paths)

        t0 = _time.perf_counter()
        threads = [threading.Thread(target=client, args=(f"c{i}", [f"s{i}.svs"]))
                   for i in range(3)]
        # 4th client shares a path with client 0: must compute once
        threads.append(threading.Thread(target=client,
                                        args=("c3", ["s0.svs", "s3.svs"])))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        wall = _time.perf_counter() - t0
        warm.join(timeout=60)

        # exactly 2 runs: the warm run + ONE merged run with the union
        assert len(calls) == 2, calls
        assert sorted(calls[1]) == ["s0.svs", "s1.svs", "s2.svs", "s3.svs"]
        # batch throughput, not 4x serial latency: 4 serial runs would be
        # >= 4*(0.25+0.08) = 1.32s of fake pipeline time after the warm run
        assert wall < 1.2, wall
        for i in range(3):
            assert outs[f"c{i}"][0] == {f"s{i}.svs": {"A": 1.0, "B": 2.0,
                                                      "C": 3.0}}
        assert set(outs["c3"][0]) == {"s0.svs", "s3.svs"}
    finally:
        svc.close()


def test_http_merged_run_quarantines_and_fans_out_failures():
    """Per-slide failures inside a merged run reach exactly the requesters
    of that slide; a catastrophic predictor error fails every merged
    request but the service keeps serving."""
    import threading
    import time as _time

    from sequoia_tpu import http_serve

    calls: list[tuple] = []
    svc = http_serve.PredictorService(
        _slow_fake_predictor(calls), ["A", "B", "C"])
    try:
        warm = threading.Thread(target=svc.predict, args=(["warm.svs"],))
        warm.start()
        _time.sleep(0.1)
        outs: dict[str, tuple] = {}

        def client(name, paths):
            outs[name] = svc.predict(paths)

        ts = [threading.Thread(target=client, args=("ok", ["fine.svs"])),
              threading.Thread(target=client, args=("bad", ["bad.svs"]))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        warm.join(timeout=60)
        assert outs["ok"][0]["fine.svs"]["A"] == 1.0 and not outs["ok"][1]
        assert not outs["bad"][0] and "boom" in outs["bad"][1]["bad.svs"]
        assert svc.slides_failed == 1 and svc.slides_ok >= 2

        # catastrophic: a predictor that raises outside on_error fails the
        # request but the worker survives for the next one
        class Exploder:
            vis_models = [None]

            class extractor:
                feat_type = "resnet"

            calls = 0

            @classmethod
            def predict_slides(cls, paths, on_error=None):
                cls.calls += 1
                if cls.calls == 1:
                    raise RuntimeError("catastrophic")
                for p in paths:
                    yield p, np.asarray([[1.0, 2.0, 3.0]])

        svc2 = http_serve.PredictorService(Exploder(), ["A", "B", "C"])
        try:
            with pytest.raises(RuntimeError, match="catastrophic"):
                svc2.predict(["x.svs"])
            ok, failed = svc2.predict(["y.svs"])  # worker still alive
            assert ok["y.svs"]["A"] == 1.0 and not failed
        finally:
            svc2.close()
    finally:
        svc.close()


@pytest.mark.parametrize("sub", [(2, 2), (2, 1)])
def test_corrupt_tile_slide_retries_on_tolerant_rgb_path(tmp_path, sub):
    """A corrupt JPEG tile fails the strict raw-plane batch (by design: no
    silent black planes), but the slide must still SERVE: predict_wsi /
    predict_slides retry once on the tolerant RGB path, where the bad tile
    decodes black and the fused tissue screen drops it."""
    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native library not built")
    from tests.test_native import _first_ifd_tag

    T = 64
    rng = np.random.default_rng(13)
    h, w = 5 * T, 6 * T
    lv0 = np.empty((h, w, 3), np.uint8)
    lv0[..., 0] = rng.integers(150, 220, (h, w))
    lv0[..., 1] = rng.integers(60, 140, (h, w))
    lv0[..., 2] = rng.integers(150, 230, (h, w))
    path = str(tmp_path / "corrupt.tiff")
    native.write_tiled_tiff(path, [lv0, lv0[::4, ::4]], tile=(T, T),
                            jpeg_quality=80, subsampling=sub,
                            description="synthetic|AppMag = 20")
    offs = _first_ifd_tag(path, 324)
    cnts = _first_ifd_tag(path, 325)
    with open(path, "r+b") as f:  # stomp a mid-grid tile: no JPEG SOI
        f.seek(offs[7])
        f.write(b"\x00" * cnts[7])

    pred = make_predictor()
    tup = pred._start_producer(path)
    tup[3].set()
    tup[1].join(timeout=30)
    assert tup[4] == "ycbcr", tup[4]  # raw mode picked; raw read will fail

    out = pred.predict_wsi(path)  # retried on the RGB path

    pred_rgb = make_predictor()
    pred_rgb._ycbcr_sub = lambda slide, psr: None  # RGB from the start
    np.testing.assert_allclose(out, pred_rgb.predict_wsi(path),
                               rtol=2e-4, atol=1e-4)

    # predict_slides: the corrupt slide serves, not quarantined
    failures = []
    got = dict(pred.predict_slides([path],
                                   on_error=lambda p, e: failures.append(p)))
    assert not failures and path in got
    np.testing.assert_allclose(got[path], out, rtol=2e-4, atol=1e-4)


def test_http_service_shutdown_never_strands_requests():
    """close() ordering: requests accepted before close complete (even when
    queued behind a busy worker), predict() after close raises instead of
    blocking forever on done.wait(), and close() is idempotent."""
    import threading
    import time as _time

    from sequoia_tpu import http_serve

    calls: list[tuple] = []
    svc = http_serve.PredictorService(
        _slow_fake_predictor(calls), ["A", "B", "C"])
    # occupy the worker, then queue a request AND close while it's busy
    warm = threading.Thread(target=svc.predict, args=(["warm.svs"],))
    warm.start()
    _time.sleep(0.1)
    outs: dict[str, tuple] = {}

    def client():
        outs["q"] = svc.predict(["queued.svs"])

    t = threading.Thread(target=client)
    t.start()
    _time.sleep(0.05)  # request is in the queue, worker still on warm
    svc.close()  # must wait for BOTH the in-flight and the queued request
    t.join(timeout=60)
    warm.join(timeout=60)
    assert not t.is_alive(), "queued request stranded by close()"
    assert outs["q"][0]["queued.svs"]["A"] == 1.0

    with pytest.raises(RuntimeError, match="closed"):
        svc.predict(["late.svs"])
    svc.close()  # idempotent

    # defense in depth: a request that somehow lands behind the sentinel is
    # failed loudly, not stranded
    svc2 = http_serve.PredictorService(
        _slow_fake_predictor([]), ["A"])
    svc2.close()
    req = http_serve._Request(["ghost.svs"])
    svc2._pending.put(req)
    svc2._fail_remaining()
    assert req.done.is_set() and isinstance(req.error, RuntimeError)


# (2, 2) = 4:2:0 (classic Aperio), (2, 1) = 4:2:2 (GT450 — the native
# reader's libjpeg-direct tile decode)
@pytest.mark.parametrize("sub", [(2, 2), (2, 1)])
def test_predict_wsi_raw_ycbcr_mode_matches_rgb_mode(tmp_path, sub):
    """A JPEG-tiled slide whose tiles match the patch size streams raw
    subsampled YCbCr planes (half the upload bytes); the device-side
    reconstruction must be BIT-exact vs the RGB decode per patch (including
    edge tiles masked via valid_wh), the keep flags identical, and the
    final prediction equal to the RGB-mode run."""
    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native library not built")
    from sequoia_tpu.ops import ycbcr

    # dims NOT multiples of the 64px tile: the last tile column/row are
    # edge tiles exercising the valid_wh device masking
    w, h, ps = 6 * 64 + 40, 5 * 64 + 16, 64
    rng = np.random.default_rng(7)
    lv0 = np.empty((h, w, 3), np.uint8)
    lv0[..., 0] = rng.integers(150, 220, (h, w))
    lv0[..., 1] = rng.integers(60, 140, (h, w))
    lv0[..., 2] = rng.integers(150, 230, (h, w))
    path = str(tmp_path / "jq.tiff")
    native.write_tiled_tiff(path, [lv0, lv0[::4, ::4]], tile=(ps, ps),
                            jpeg_quality=80, subsampling=sub,
                            description="synthetic|AppMag = 20")

    pred = make_predictor()
    slide = native.NativeTiffReader(path)
    assert pred._ycbcr_sub(slide, ps) == sub

    # per-chunk: reconstruction+masking == the RGB iterator's pixels
    rgb_chunks = list(pred.iter_raw_chunks(native.NativeTiffReader(path)))
    ycc_chunks = list(pred.iter_raw_ycbcr_chunks(
        native.NativeTiffReader(path)))
    assert len(rgb_chunks) == len(ycc_chunks)
    saw_edge = False
    for rgb, (packed, wh) in zip(rgb_chunks, ycc_chunks):
        rec = np.asarray(ycbcr.planar_to_rgb(packed, ps, ps, *sub))
        cols = np.arange(ps)
        valid = ((cols[None, None, :] < wh[:, 0, None, None])
                 & (cols[None, :, None] < wh[:, 1, None, None]))
        rec = np.where(valid[..., None], rec, 0)
        np.testing.assert_array_equal(rec, rgb)
        saw_edge |= bool((wh < ps).any())
    assert saw_edge, "fixture should include edge tiles"

    out_ycc = pred.predict_wsi(path)

    # force the RGB mode by hiding the probe
    pred_rgb = make_predictor()
    pred_rgb._ycbcr_sub = lambda slide, psr: None
    out_rgb = pred_rgb.predict_wsi(path)
    np.testing.assert_allclose(out_ycc, out_rgb, rtol=0, atol=1e-5)


def test_predict_wsi_raw_ycbcr_with_mesh_matches_single_device(tmp_path):
    """The YCbCr producer under --data_parallel: both the packed planes and
    the per-tile valid extents shard over the mesh 'data' axis inside the
    fused program; prediction equals the single-device YCbCr run."""
    native = pytest.importorskip("sequoia_tpu.native")
    if not native.available():
        pytest.skip("native library not built")
    from sequoia_tpu.parallel import sharding as sh

    w, h, ps = 5 * 64 + 32, 4 * 64 + 16, 64  # edge tiles included
    rng = np.random.default_rng(11)
    lv0 = np.empty((h, w, 3), np.uint8)
    lv0[..., 0] = rng.integers(150, 220, (h, w))
    lv0[..., 1] = rng.integers(60, 140, (h, w))
    lv0[..., 2] = rng.integers(150, 230, (h, w))
    path = str(tmp_path / "jq_mesh.tiff")
    native.write_tiled_tiff(path, [lv0, lv0[::4, ::4]], tile=(ps, ps),
                            jpeg_quality=80,
                            description="synthetic|AppMag = 20")

    cfg = vis.ViSConfig(num_outputs=5, input_dim=2048, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    models = [(cfg, vis.init(cfg, jax.random.PRNGKey(0)))]
    rparams = resnet.random_params(jax.random.PRNGKey(0))

    single = SlidePredictor(
        FeatureExtractor("resnet", rparams, batch_size=16, patch_size=64),
        models, n_clusters=8, max_patches=48, patch_size=64)
    mesh = sh.make_mesh(n_data=8, n_model=1)
    sharded = SlidePredictor(
        FeatureExtractor("resnet", rparams, batch_size=16, patch_size=64,
                         mesh=mesh),
        models, n_clusters=8, max_patches=48, patch_size=64)

    # both must actually take the YCbCr mode (probe, then reap the thread)
    probe = single._start_producer(path)
    assert probe[4] == "ycbcr"
    probe[3].set()
    probe[1].join(timeout=30)
    out_single = single.predict_wsi(path)
    out_sharded = sharded.predict_wsi(path)
    np.testing.assert_allclose(out_sharded, out_single, rtol=2e-4, atol=1e-4)


def test_predict_wsi_appmag40_screened_mode():
    """A 40x slide (resize_factor 2) must take the host-screened producer
    (reads 512px regions, PIL-resizes to 256 — reference
    patch_gen_hdf5.py:86-89,116-117 semantics) and match predict_patches
    on the same screened extraction."""
    from sequoia_tpu.data.wsi import ArrayReader

    rng = np.random.default_rng(3)
    h = w = 4 * 128  # grid steps by 2 x 64 = 128 at level 0
    lv0 = np.empty((h, w, 3), np.uint8)
    lv0[..., 0] = rng.integers(150, 220, (h, w))
    lv0[..., 1] = rng.integers(60, 140, (h, w))
    lv0[..., 2] = rng.integers(150, 230, (h, w))
    reader = ArrayReader([lv0, lv0[::4, ::4]],
                         properties={"aperio.AppMag": "40"})

    pred = make_predictor()
    tup = pred._start_producer(reader)
    assert tup[4] == "screened"
    tup[3].set()
    tup[1].join(timeout=30)

    out = pred.predict_wsi(reader)
    assert out.shape == (1, 5) and np.isfinite(out).all()
    patches = pred.extract_patches(reader)
    assert patches.shape[1:] == (64, 64, 3) and len(patches) > 0
    np.testing.assert_allclose(pred.predict_patches(patches), out,
                               rtol=2e-4, atol=1e-4)
