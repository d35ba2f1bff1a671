"""Fused ViS Pallas kernel (ops/pallas_vis.py) vs the reference-parity
``vis.apply`` — interpret mode (CPU CI); the real-chip A/B lives in
tools/bench_vis_fused.py and docs/BENCHMARKS.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sequoia_tpu.models import vis
from sequoia_tpu.ops import pallas_vis as pv


def _cfg(depth=2, compute_dtype=None, **kw):
    base = dict(num_outputs=32, input_dim=256, depth=depth, nheads=4,
                dim_f=32, dim_s=32, dim_c=32, num_clusters=10,
                compute_dtype=compute_dtype)
    base.update(kw)
    return vis.ViSConfig(**base)


def test_supported_predicate():
    assert pv.supported(_cfg())
    # D != 2 * H*df
    assert not pv.supported(_cfg(input_dim=384))
    # mixed projection widths
    assert not pv.supported(_cfg(dim_s=16))
    # lane alignment
    assert not pv.supported(vis.ViSConfig(num_outputs=8, input_dim=64,
                                          nheads=2, dim_f=16, dim_s=16,
                                          dim_c=16, num_clusters=4))


@pytest.mark.parametrize("depth,n", [(1, 10), (3, 10), (2, 100)])
def test_fused_matches_f32_apply(depth, n):
    cfg = _cfg(depth=depth, num_clusters=n)
    params = vis.init(cfg, jax.random.PRNGKey(depth))
    packed = pv.pack_vis_blocks(cfg, params, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(n).normal(
        size=(1, n, cfg.input_dim)), jnp.float32)
    want = np.asarray(vis.apply(cfg, params, x))
    got = np.asarray(pv.vis_apply_fused(cfg, params, packed, x,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_bf16_close_to_bf16_apply():
    cfg = _cfg(depth=2, compute_dtype="bfloat16")
    params = vis.init(cfg, jax.random.PRNGKey(0))
    packed = pv.pack_vis_blocks(cfg, params, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, cfg.num_clusters, cfg.input_dim)), jnp.float32)
    want = np.asarray(vis.apply(cfg, params, x))
    got = np.asarray(pv.vis_apply_fused(cfg, params, packed, x,
                                        interpret=True))
    # both paths round through bf16 (in slightly different places); they
    # must agree to bf16 tolerance and track the f32 path equally well
    f32 = np.asarray(vis.apply(_cfg(depth=2), params, x))
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999
    assert (np.abs(got - f32).max() < 10 * np.abs(want - f32).max() + 1e-3)


def test_fused_rejects_batch():
    cfg = _cfg()
    params = vis.init(cfg, jax.random.PRNGKey(0))
    packed = pv.pack_vis_blocks(cfg, params, dtype=jnp.float32)
    x = jnp.zeros((2, cfg.num_clusters, cfg.input_dim), jnp.float32)
    with pytest.raises(AssertionError, match="B=1"):
        pv.vis_apply_fused(cfg, params, packed, x, interpret=True)
