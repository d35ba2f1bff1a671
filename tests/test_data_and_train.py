"""Data plane + training-loop behavior tests on a synthetic feature store."""

import os

import h5py
import numpy as np
import pandas as pd
import pytest

import jax

from sequoia_tpu.data import dataset as ds
from sequoia_tpu.data import splits
from sequoia_tpu.models import he2rna, vis
from sequoia_tpu.train import he2rna_fit, loop


def make_store(root, n_slides=12, n_genes=8, dim=16, tokens=100, project="TCGA-TEST",
               broken=(), rng=None):
    rng = rng or np.random.default_rng(0)
    rows = []
    for i in range(n_slides):
        wsi = f"slide_{i:03d}.svs"
        stem = wsi.replace(".svs", "")
        d = os.path.join(root, project, stem)
        os.makedirs(d, exist_ok=True)
        if i not in broken:
            with h5py.File(os.path.join(d, stem + ".h5"), "w") as f:
                f.create_dataset("cluster_features",
                                 data=rng.normal(size=(tokens, dim)).astype(np.float32))
        row = {"wsi_file_name": wsi, "patient_id": f"P{i // 2}",
               "tcga_project": project}
        for g in range(n_genes):
            row[f"rna_G{g}"] = float(rng.normal())
        rows.append(row)
    return pd.DataFrame(rows)


def test_dataset_and_filter(tmp_path):
    df = make_store(str(tmp_path), broken=(3, 7))
    filt = ds.filter_no_features(df, str(tmp_path), "cluster_features", verbose=False)
    assert len(filt) == 10
    d = ds.FeatureDataset(filt, str(tmp_path))
    assert d.num_genes == 8 and d.feature_dim == 16
    feats = d.load_features(0)
    assert feats.shape == (100, 16)
    # .svs stripping in the h5 path (reference read_data.py:44-46)
    assert ".svs" not in d.h5_path(0)
    assert d.genes == [f"G{g}" for g in range(8)]


def test_batch_loader_pads_and_masks(tmp_path):
    df = make_store(str(tmp_path), n_slides=10, broken=(2,))
    d = ds.FeatureDataset(df, str(tmp_path))
    batches = list(ds.BatchLoader(d, batch_size=4))
    # 9 readable slides -> 2 full batches + 1 padded remainder batch
    assert len(batches) == 3
    assert batches[-1].features.shape == (4, 100, 16)
    assert batches[-1].n_valid == 1
    assert all(b.features.shape == (4, 100, 16) for b in batches)
    # broken slide silently skipped (collate-filter semantics)
    all_wsi = [w for b in batches for w in b.wsi]
    assert "slide_002.svs" not in all_wsi and len(all_wsi) == 9


def test_patient_kfold_reference_parity():
    """Against the reference formula (utils.py:79-110) executed directly."""
    from sklearn.model_selection import KFold, train_test_split

    patient_ids = np.array([f"P{i % 7}" for i in range(20)])
    tr, va, te = splits.patient_kfold(patient_ids, n_splits=3)

    indices = np.arange(20)
    uniq = np.unique(patient_ids)
    skf = KFold(3, shuffle=True, random_state=0)
    for k, (ind_train, ind_test) in enumerate(skf.split(uniq)):
        p_train, p_test = uniq[ind_train], uniq[ind_test]
        ref_test = indices[np.any(patient_ids[:, None] == p_test[None], axis=1)]
        np.testing.assert_array_equal(te[k], ref_test)
        p_train2, p_valid = train_test_split(p_train, test_size=0.1, random_state=0)
        ref_val = indices[np.any(patient_ids[:, None] == p_valid[None], axis=1)]
        ref_train = indices[np.any(patient_ids[:, None] == p_train2[None], axis=1)]
        np.testing.assert_array_equal(va[k], ref_val)
        np.testing.assert_array_equal(tr[k], ref_train)
        # patient-level disjointness
        assert not set(patient_ids[tr[k]]) & set(patient_ids[te[k]])
        assert not set(patient_ids[tr[k]]) & set(patient_ids[va[k]])


def test_train_loop_learns_and_early_stop_logic(tmp_path):
    df = make_store(str(tmp_path), n_slides=16, n_genes=4, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path))
    cfg = vis.ViSConfig(num_outputs=4, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    loaders = {"train": ds.BatchLoader(d, 4, shuffle=True, seed=0),
               "val": ds.BatchLoader(d, 4)}
    apply_fn = lambda p, x: vis.apply(cfg, p, x)
    saved = []
    res = loop.train(apply_fn, params, loop.make_adamw(1e-3), loaders,
                     num_epochs=8, patience=3, verbose=False,
                     save_fn=lambda p: saved.append(True))
    assert res.best_epoch >= 0 and saved
    losses = [h["val"]["loss"] for h in res.history]
    assert losses[-1] < losses[0]  # it learns

    preds, real, wsis, projs = loop.evaluate(apply_fn, res.params,
                                             ds.BatchLoader(d, 4), verbose=False)
    assert preds.shape == (16, 4) and real.shape == (16, 4)
    assert len(wsis) == 16 and set(projs) == {"TCGA-TEST"}

    p2, w2, j2 = loop.predict(apply_fn, res.params, ds.BatchLoader(d, 4))
    np.testing.assert_allclose(p2, preds, rtol=1e-5, atol=1e-6)


def test_train_h2d_bf16_cast_is_bit_identical(tmp_path):
    # loop.train(h2d_dtype=...) casts feature batches on host (on the
    # prefetch thread) before upload; for a model whose FIRST op is the same
    # cast (compute_dtype set, models/vis.py apply) the trajectory must be
    # BIT-identical to uploading f32 — both casts are round-to-nearest-even.
    df = make_store(str(tmp_path), n_slides=8, n_genes=3, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path))
    cfg = vis.ViSConfig(num_outputs=3, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100,
                        compute_dtype="bfloat16")
    apply_fn = lambda p, x: vis.apply(cfg, p, x)

    def run(h2d):
        params = vis.init(cfg, jax.random.PRNGKey(0))
        loaders = {"train": ds.BatchLoader(d, 4, shuffle=True, seed=0),
                   "val": ds.BatchLoader(d, 4)}
        return loop.train(apply_fn, params, loop.make_adamw(1e-3), loaders,
                          num_epochs=2, verbose=False, h2d_dtype=h2d)

    a, b = run(None), run("bfloat16")
    assert a.history == b.history  # float-for-float identical metrics
    jax.tree.map(np.testing.assert_array_equal, a.final_params,
                 b.final_params)


def test_low_mem_adamw_matches_optax_at_f32():
    import jax.numpy as jnp
    import optax

    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (16, 8)),
              "b": jnp.zeros((8,), jnp.float32)}
    ref = loop.make_adamw(1e-3, weight_decay=0.01)
    new = loop.make_adamw(1e-3, weight_decay=0.01, moment_dtype="float32")
    sr, sn = ref.init(params), new.init(params)
    pr = pn = params
    for i in range(5):
        g = jax.tree.map(lambda p: jnp.sin(p + i), pr)
        ur, sr = ref.update(g, sr, pr)
        pr = optax.apply_updates(pr, ur)
        g = jax.tree.map(lambda p: jnp.sin(p + i), pn)
        un, sn = new.update(g, sn, pn)
        pn = optax.apply_updates(pn, un)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                         atol=1e-7), pr, pn)


def test_low_mem_adamw_bf16_trains_and_shards(tmp_path):
    import jax.numpy as jnp

    from sequoia_tpu.parallel import sharding as sh

    df = make_store(str(tmp_path), n_slides=8, n_genes=3, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path))
    cfg = vis.ViSConfig(num_outputs=3, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    opt = loop.make_adamw(1e-2, moment_dtype="bfloat16")

    state = opt.init(params)
    assert state["mu"]["head_w"].dtype == jnp.bfloat16
    assert state["nu"]["blocks"]["wf"].dtype == jnp.bfloat16
    # the dict state's mu/nu mirror the param tree, so the mesh sharding
    # helper assigns them the param specs (gene-head moments on 'model')
    specs = sh.opt_state_pspecs(state, params)
    assert specs["mu"] == sh.param_pspecs(params)
    assert specs["nu"] == sh.param_pspecs(params)

    loaders = {"train": ds.BatchLoader(d, 4, shuffle=True, seed=0),
               "val": ds.BatchLoader(d, 4)}
    res = loop.train(lambda p, x: vis.apply(cfg, p, x), params, opt, loaders,
                     num_epochs=6, verbose=False)
    losses = [h["train"]["loss"] for h in res.history]
    assert losses[-1] < losses[0]  # bf16-moment AdamW still learns


def test_he2rna_fit_quick(tmp_path):
    df = make_store(str(tmp_path), n_slides=12, n_genes=3, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path))
    cfg = he2rna.HE2RNAConfig(input_dim=8, output_dim=3, layers=(8,),
                              ks=(1, 5, 20, 100))
    params = he2rna.init(cfg, jax.random.PRNGKey(0))
    out = he2rna_fit.fit(cfg, params, 1e-3,
                         ds.BatchLoader(d, 4, shuffle=True),
                         ds.BatchLoader(d, 4),
                         ds.BatchLoader(d, 4),
                         max_epochs=3, patience=100, verbose=False)
    preds, labels, wsis, projs = out
    assert preds.shape == (12, 3) and (preds >= 0).all()  # ReLU applied
    assert labels.shape == (12, 3) and len(wsis) == 12


def test_stats_match_reference_formulas():
    import jax.numpy as jnp
    from sequoia_tpu.ops import stats

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(6, 5)).astype(np.float32)
    real = rng.normal(size=(6, 5)).astype(np.float32)
    real[:, 2] = 1.0  # constant gene -> skipped by compute_correlations
    valid = np.ones((6,), bool)

    got = float(stats.mean_correlation(jnp.asarray(pred), jnp.asarray(real),
                                       jnp.asarray(valid)))
    want = he2rna_fit.host_compute_correlations(real, pred)
    assert abs(got - want) < 1e-5

    sm = float(stats.masked_smape(jnp.asarray(pred), jnp.asarray(real),
                                  jnp.asarray(valid)))
    want_sm = 100 / 6 * np.sum(2 * np.abs(pred - real) /
                               (np.abs(real) + np.abs(pred)))
    assert abs(sm - want_sm) < 1e-3


def test_train_state_resume(tmp_path):
    df = make_store(str(tmp_path / "f"), n_slides=8, n_genes=3, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path / "f"))
    cfg = vis.ViSConfig(num_outputs=3, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    apply_fn = lambda p, x: vis.apply(cfg, p, x)
    state = str(tmp_path / "state.npz")

    def loaders():
        return {"train": ds.BatchLoader(d, 4, shuffle=True, seed=0),
                "val": ds.BatchLoader(d, 4)}

    params = vis.init(cfg, jax.random.PRNGKey(0))
    r1 = loop.train(apply_fn, params, loop.make_adamw(1e-3), loaders(),
                    num_epochs=3, verbose=False, state_path=state)
    assert os.path.exists(state)
    assert len(r1.history) == 3

    # resume continues from epoch 3 and runs exactly 2 more
    params2 = vis.init(cfg, jax.random.PRNGKey(0))
    r2 = loop.train(apply_fn, params2, loop.make_adamw(1e-3), loaders(),
                    num_epochs=5, verbose=False, state_path=state)
    assert len(r2.history) == 5
    # loss keeps decreasing across the resume boundary
    assert r2.history[-1]["val"]["loss"] < r1.history[0]["val"]["loss"]


def test_save_load_train_state_roundtrip(tmp_path):
    from sequoia_tpu.train import checkpoint as ck
    import optax

    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": [np.ones(4, np.float32)]}
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    path = str(tmp_path / "s.npz")
    ck.save_train_state(path, params, opt_state, {"epoch": 7, "best_loss": 0.5})
    p2, o2, meta = ck.load_train_state(path)
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(p2["a"], params["a"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(b)),
                 opt_state, o2)


def test_prefetch_iterator(tmp_path):
    df = make_store(str(tmp_path), n_slides=9, n_genes=2, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path))
    direct = list(ds.BatchLoader(d, 4))
    pre = list(ds.prefetch(ds.BatchLoader(d, 4), depth=2))
    assert len(pre) == len(direct)
    for a, b in zip(pre, direct):
        np.testing.assert_array_equal(a.features, b.features)
        assert a.wsi == b.wsi


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise ValueError("boom")

    it = ds.prefetch(bad())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_prefetch_close_unblocks_abandoned_worker():
    """close() on a part-consumed prefetch must terminate the reader thread
    (regression: the worker blocked in q.put forever once the consumer
    stopped draining)."""
    def endless():
        i = 0
        while True:
            yield i
            i += 1

    it = ds.prefetch(endless(), depth=2)
    assert next(it) == 0  # worker is now blocked on the full queue
    it.close()
    assert not it._t.is_alive()
    with pytest.raises(StopIteration):
        next(it)


def test_stage_timer():
    import time
    from sequoia_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("features", items=100):
        time.sleep(0.01)
    with t.stage("kmeans", items=100):
        time.sleep(0.005)
    assert t.rate("features") > 0
    assert t.slides_per_hour("features") == t.rate("features") * 3600
    assert "features" in t.report() and "kmeans" in t.report()


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sequoia_tpu.train import checkpoint as ck

    cfg = vis.ViSConfig(num_outputs=4, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=5)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    ck.save_orbax(path, params)
    restored = ck.load_orbax(path, like=params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, restored)


def test_orbax_sharded_roundtrip(tmp_path):
    """Multi-host checkpoint story: save a TP-sharded train state with
    orbax, restore with the same shardings, bit-identical — on the 8-device
    CPU mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sequoia_tpu.parallel import sharding as sh
    from sequoia_tpu.train import checkpoint as ck

    mesh = sh.make_mesh(n_data=4, n_model=2)
    head_shard = NamedSharding(mesh, P(None, "model"))
    repl = NamedSharding(mesh, P())
    tree = {
        "head_w": jax.device_put(
            jax.random.normal(jax.random.PRNGKey(0), (64, 128)), head_shard),
        "body": jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (32, 32)), repl),
    }
    path = str(tmp_path / "sharded")
    ck.save_orbax(path, tree)

    like = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        tree)
    restored = ck.load_orbax(path, like=like)
    assert restored["head_w"].sharding.spec == P(None, "model")
    np.testing.assert_array_equal(np.asarray(restored["head_w"]),
                                  np.asarray(tree["head_w"]))
    np.testing.assert_array_equal(np.asarray(restored["body"]),
                                  np.asarray(tree["body"]))


def test_resume_after_early_stop_does_not_continue(tmp_path):
    """A fold that already early-stopped must not train further on resume:
    the state snapshot carries the post-decision stop flag (a pre-decision
    snapshot let resumed runs sail past the == patience trip point)."""
    df = make_store(str(tmp_path / "f"), n_slides=8, n_genes=3, dim=8)
    d = ds.FeatureDataset(df, str(tmp_path / "f"))
    cfg = vis.ViSConfig(num_outputs=3, input_dim=8, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=100)
    apply_fn = lambda p, x: vis.apply(cfg, p, x)
    state = str(tmp_path / "state.npz")

    def loaders():
        return {"train": ds.BatchLoader(d, 4, shuffle=True, seed=0),
                "val": ds.BatchLoader(d, 4)}

    # lr=0: no param ever improves -> epoch_since_best trips patience=2
    # at epoch 2 and training stops early
    params = vis.init(cfg, jax.random.PRNGKey(0))
    r1 = loop.train(apply_fn, params, loop.make_adamw(0.0), loaders(),
                    num_epochs=50, patience=2, verbose=False,
                    state_path=state)
    assert len(r1.history) < 50  # early-stopped

    r2 = loop.train(apply_fn, vis.init(cfg, jax.random.PRNGKey(0)),
                    loop.make_adamw(0.0), loaders(), num_epochs=50,
                    patience=2, verbose=False, state_path=state)
    assert len(r2.history) == len(r1.history)  # resumed run adds NOTHING


def test_mean_correlation_all_skipped_is_nan():
    """Every gene constant-in-batch -> NaN like the reference's np.mean of
    an empty list, not a fabricated 0.0 entering best-model selection."""
    import jax.numpy as jnp

    from sequoia_tpu.ops import stats

    pred = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)),
                       jnp.float32)
    real = jnp.ones((4, 3), jnp.float32)  # constant targets: all skipped
    valid = jnp.ones((4,), bool)
    assert np.isnan(float(stats.mean_correlation(pred, real, valid)))


def test_prefetch_iterator_exhaustion_keeps_raising():
    """Exhausted PrefetchIterator must keep raising StopIteration (iterator
    protocol) instead of blocking forever on an empty queue."""
    it = ds.prefetch(iter([1, 2]), depth=2)
    assert list(it) == [1, 2]
    import pytest

    for _ in range(3):
        with pytest.raises(StopIteration):
            next(it)


def test_patient_kfold_seed_threads_to_valid_split():
    ids = np.asarray([f"p{i}" for i in range(30)])
    tr0, va0, te0 = splits.patient_kfold(ids, n_splits=3, random_state=0)
    tr1, va1, te1 = splits.patient_kfold(ids, n_splits=3, random_state=7)
    # different seed changes BOTH the test folds and the valid carve-out
    assert not all(np.array_equal(a, b) for a, b in zip(te0, te1))
    assert not all(np.array_equal(a, b) for a, b in zip(va0, va1))
