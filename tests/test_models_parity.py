"""Forward/backward parity of the JAX models vs torch-functional goldens.

The goldens (tests/torch_goldens.py) run in float64; the JAX side runs in
float32, so agreement to ~1e-4 relative validates both the math and the
state-dict converters.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sequoia_tpu.models import convert, he2rna, vis, vit
from tests import torch_goldens as tg


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)


@pytest.mark.parametrize("D,depth,H,G,N,B", [(32, 2, 4, 16, 10, 3), (96, 3, 6, 33, 7, 2)])
def test_vis_forward_parity(D, depth, H, G, N, B):
    df = ds = dc = 8
    rng = torch.Generator().manual_seed(0)
    sd = tg.make_torch_sd(rng, tg.vis_shapes(G, D, depth, H, df, ds, dc, N))
    x = torch.randn(B, N, D, generator=rng).double()
    golden = tg.vis_forward(sd, x, depth, H, df, ds).numpy()

    cfg, params = convert.vis_from_torch(sd)
    assert cfg == vis.ViSConfig(num_outputs=G, input_dim=D, depth=depth,
                                nheads=H, dim_f=df, dim_s=ds, dim_c=dc,
                                num_clusters=N)
    out = jax.jit(lambda p, x: vis.apply(cfg, p, x))(params, jnp.asarray(x.numpy(), jnp.float32))
    assert rel_err(out, golden) < 1e-4


@pytest.mark.slow
def test_vis_full_size_forward_parity():
    """Reference production shape: D=2048, depth 6, 16 heads, 100 clusters."""
    D, depth, H, G, N, B = 2048, 6, 16, 137, 100, 2
    rng = torch.Generator().manual_seed(1)
    sd = tg.make_torch_sd(rng, tg.vis_shapes(G, D, depth, H, 64, 64, 64, N))
    x = torch.randn(B, N, D, generator=rng).double()
    golden = tg.vis_forward(sd, x, depth, H, 64, 64).numpy()
    cfg, params = convert.vis_from_torch(sd)
    out = vis.apply(cfg, params, jnp.asarray(x.numpy(), jnp.float32))
    assert rel_err(out, golden) < 1e-4


def test_vis_grad_parity():
    D, depth, H, G, N, B = 32, 2, 4, 12, 10, 3
    df = ds = dc = 8
    rng = torch.Generator().manual_seed(2)
    sd = tg.make_torch_sd(rng, tg.vis_shapes(G, D, depth, H, df, ds, dc, N))
    for v in sd.values():
        v.requires_grad_(True)
    x = torch.randn(B, N, D, generator=rng).double()
    y = torch.randn(B, G, generator=rng).double()
    loss = torch.mean((tg.vis_forward(sd, x, depth, H, df, ds) - y) ** 2)
    loss.backward()

    cfg, params = convert.vis_from_torch({k: v.detach() for k, v in sd.items()})

    def jax_loss(p):
        pred = vis.apply(cfg, p, jnp.asarray(x.detach().numpy(), jnp.float32))
        return jnp.mean((pred - jnp.asarray(y.numpy(), jnp.float32)) ** 2)

    grads = jax.grad(jax_loss)(params)
    # Spot-check a few structurally different params via the reverse converter.
    gsd = convert.vis_to_torch(cfg, grads)
    for name in ["pos_emb1D", "linear_head.1.weight",
                 "transformer.layers.0.0.mixers.1.f.weight",
                 "transformer.layers.1.0.mixers.3.c.bias",
                 "transformer.layers.0.0.mixers.2.s.weight",
                 "transformer.layers.1.0.projection.weight",
                 "transformer.layers.0.1.net.1.weight"]:
        assert rel_err(gsd[name], sd[name].grad.numpy()) < 1e-3, name


def test_vis_converter_roundtrip():
    cfg = vis.ViSConfig(num_outputs=9, input_dim=24, depth=2, nheads=3,
                        dim_f=5, dim_s=6, dim_c=7, num_clusters=11)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    sd = convert.vis_to_torch(cfg, params)
    cfg2, params2 = convert.vis_from_torch(sd, cfg)
    assert cfg2 == cfg
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, params2)


@pytest.mark.parametrize("D,depth,H,dh,mlp,G,N,B", [(32, 2, 4, 8, 48, 16, 10, 3)])
def test_vit_forward_parity(D, depth, H, dh, mlp, G, N, B):
    rng = torch.Generator().manual_seed(3)
    sd = tg.make_torch_sd(rng, tg.vit_shapes(G, D, depth, H, dh, mlp, N))
    x = torch.randn(B, N, D, generator=rng).double()
    golden = tg.vit_forward(sd, x, depth, H, dh).numpy()
    cfg = vit.ViTConfig(num_outputs=G, dim=D, depth=depth, heads=H,
                        dim_head=dh, mlp_dim=mlp, num_clusters=N)
    cfg2, params = convert.vit_from_torch(sd, cfg)
    out = jax.jit(lambda p, x: vit.apply(cfg, p, x))(params, jnp.asarray(x.numpy(), jnp.float32))
    assert rel_err(out, golden) < 1e-4


def test_vit_full_size_forward_parity():
    D, depth, H, dh, mlp, G, N, B = 1024, 6, 16, 64, 2048, 51, 100, 2
    rng = torch.Generator().manual_seed(4)
    sd = tg.make_torch_sd(rng, tg.vit_shapes(G, D, depth, H, dh, mlp, N))
    x = torch.randn(B, N, D, generator=rng).double()
    golden = tg.vit_forward(sd, x, depth, H, dh).numpy()
    cfg, params = convert.vit_from_torch(sd)
    assert cfg.heads == H and cfg.mlp_dim == mlp
    out = vit.apply(cfg, params, jnp.asarray(x.numpy(), jnp.float32))
    assert rel_err(out, golden) < 1e-4


def test_vit_grad_parity():
    D, depth, H, dh, mlp, G, N, B = 32, 2, 4, 8, 48, 12, 10, 3
    rng = torch.Generator().manual_seed(5)
    sd = tg.make_torch_sd(rng, tg.vit_shapes(G, D, depth, H, dh, mlp, N))
    for v in sd.values():
        v.requires_grad_(True)
    x = torch.randn(B, N, D, generator=rng).double()
    y = torch.randn(B, G, generator=rng).double()
    loss = torch.mean((tg.vit_forward(sd, x, depth, H, dh) - y) ** 2)
    loss.backward()

    cfg = vit.ViTConfig(num_outputs=G, dim=D, depth=depth, heads=H,
                        dim_head=dh, mlp_dim=mlp, num_clusters=N)
    _, params = convert.vit_from_torch({k: v.detach() for k, v in sd.items()}, cfg)

    def jax_loss(p):
        pred = vit.apply(cfg, p, jnp.asarray(x.detach().numpy(), jnp.float32))
        return jnp.mean((pred - jnp.asarray(y.numpy(), jnp.float32)) ** 2)

    grads = jax.grad(jax_loss)(params)
    gsd = convert.vit_to_torch(cfg, grads)
    for name in ["pos_emb1D", "transformer.layers.0.0.to_qkv.weight",
                 "transformer.layers.1.0.to_out.weight",
                 "transformer.layers.0.1.net.1.weight", "linear_head.1.weight"]:
        assert rel_err(gsd[name], sd[name].grad.numpy()) < 1e-3, name


def test_he2rna_eval_parity_with_padding():
    # T=100 tiles, matching the reference contract (ks go up to 100 and
    # torch.topk requires k <= T; the pipeline always feeds 100 tokens).
    D, layers, G, B, T = 24, (16, 16), 9, 3, 100
    ks = (1, 2, 5, 10, 20, 50, 100)
    rng = torch.Generator().manual_seed(6)
    sd = tg.make_torch_sd(rng, tg.he2rna_shapes(D, layers, G))
    # Positive-ish features with zero-padded tail tiles (mask quirk coverage):
    x = torch.rand(B, T, D, generator=rng).double()
    x[0, 80:] = 0.0
    x[1, 15:] = 0.0
    golden = tg.he2rna_eval_forward(sd, x, n_layers=3, ks=ks).numpy()

    cfg, params = convert.he2rna_from_torch(sd)
    assert cfg == he2rna.HE2RNAConfig(input_dim=D, output_dim=G, layers=layers, ks=ks)
    out = he2rna.apply(cfg, params, jnp.asarray(x.numpy(), jnp.float32))
    assert rel_err(out, golden) < 1e-4


def test_he2rna_train_forward_uses_single_k():
    cfg = he2rna.HE2RNAConfig(input_dim=8, output_dim=4, layers=(6,), ks=(1, 3), dropout=0.0)
    params = he2rna.init(cfg, jax.random.PRNGKey(0))
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8)))
    outs = set()
    for seed in range(8):
        o = he2rna.apply(cfg, params, x, train=True, rng=jax.random.PRNGKey(seed))
        outs.add(float(o[0, 0]))
    # With dropout off, train-mode output must equal one of the fixed-k outputs.
    scores = he2rna.tile_scores(cfg, params, x)
    mask = (jnp.max(x, axis=2) > 0).astype(jnp.float32)
    fixed = {float(he2rna._topk_masked_mean(scores, mask, k)[0, 0]) for k in cfg.ks}
    assert outs.issubset(fixed) and len(outs) > 1


def test_he2rna_converter_roundtrip():
    cfg = he2rna.HE2RNAConfig(input_dim=12, output_dim=5, layers=(7, 6))
    params = he2rna.init(cfg, jax.random.PRNGKey(0))
    sd = convert.he2rna_to_torch(cfg, params)
    cfg2, params2 = convert.he2rna_from_torch(sd)
    assert (cfg2.input_dim, cfg2.output_dim, cfg2.layers) == (12, 5, (7, 6))
    for a, b in zip(params["w"] + params["b"], params2["w"] + params2["b"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_replace_head_changes_only_head():
    cfg = vis.ViSConfig(num_outputs=10, input_dim=16, depth=1, nheads=2,
                        dim_f=4, dim_s=4, dim_c=4, num_clusters=5)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    cfg2, params2 = vis.replace_head(cfg, params, 33, jax.random.PRNGKey(1))
    assert cfg2.num_outputs == 33 and params2["head_w"].shape == (16, 33)
    np.testing.assert_array_equal(np.asarray(params["blocks"]["wf"]),
                                  np.asarray(params2["blocks"]["wf"]))


def test_vis_bf16_fast_path_close_to_f32():
    import dataclasses as dc

    cfg = vis.ViSConfig(num_outputs=16, input_dim=64, depth=2, nheads=4,
                        dim_f=8, dim_s=8, dim_c=8, num_clusters=10)
    params = vis.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 64), jnp.float32)
    ref = np.asarray(vis.apply(cfg, params, x))
    fast = np.asarray(vis.apply(dc.replace(cfg, compute_dtype="bfloat16"),
                                params, x))
    assert fast.dtype == np.float32
    assert rel_err(fast, ref) < 3e-2  # bf16 mantissa budget


def test_he2rna_topk_custom_vjp_matches_autodiff():
    """The hand-written top-k backward == autodiff through lax.top_k."""
    rng = np.random.default_rng(9)
    B, T, G, k = 3, 20, 7, 5
    scores = jnp.asarray(rng.normal(size=(B, T, G)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, T)) > 0.2).astype(np.float32))

    def with_custom(s):
        return jnp.sum(he2rna._topk_masked_mean(s, mask, k) ** 2)

    def with_autodiff(s):
        masked = s * mask[:, :, None]
        top = jax.lax.top_k(masked.transpose(0, 2, 1), k)[0]
        denom = jnp.sum(mask[:, :k], axis=1)
        num = jnp.sum(top * mask[:, None, :k], axis=2)
        return jnp.sum((num / denom[:, None]) ** 2)

    np.testing.assert_allclose(float(with_custom(scores)),
                               float(with_autodiff(scores)), rtol=1e-6)
    g1 = jax.grad(with_custom)(scores)
    g2 = jax.grad(with_autodiff)(scores)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_he2rna_padded_rows_do_not_nan():
    """Zero-padded batch rows must yield 0 predictions and finite gradients
    (the reference never pads; our fixed-shape batches do)."""
    from sequoia_tpu.ops import stats

    cfg = he2rna.HE2RNAConfig(input_dim=8, output_dim=3, layers=(6,), ks=(1, 3))
    params = he2rna.init(cfg, jax.random.PRNGKey(0))
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (4, 5, 8)))
    x = x.at[3].set(0.0)  # padded row
    valid = jnp.asarray([True, True, True, False])
    y = jax.random.normal(jax.random.PRNGKey(2), (4, 3))

    pred = he2rna.apply(cfg, params, x)
    assert np.isfinite(np.asarray(pred)).all()
    np.testing.assert_array_equal(np.asarray(pred[3]), 0.0)

    def lf(p):
        pr = he2rna.apply(cfg, p, x, train=True, rng=jax.random.PRNGKey(3))
        return stats.masked_mse(pr, y, valid)

    loss = float(lf(params))
    assert np.isfinite(loss)
    g = jax.grad(lf)(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))


def test_vit_bf16_fast_path_close_to_f32():
    import dataclasses as dc

    cfg = vit.ViTConfig(num_outputs=16, dim=64, depth=2, heads=4,
                        dim_head=8, mlp_dim=96, num_clusters=10)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 64), jnp.float32)
    ref = np.asarray(vit.apply(cfg, params, x))
    fast = np.asarray(vit.apply(dc.replace(cfg, compute_dtype="bfloat16"),
                                params, x))
    assert fast.dtype == np.float32
    assert rel_err(fast, ref) < 3e-2
