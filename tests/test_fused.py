"""Device-resident whole-slide program smoke test (tiny shapes, CPU)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet, vis
from sequoia_tpu.pipeline.fused import make_slide_program


@pytest.mark.slow
def test_slide_program_runs_and_is_deterministic():
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.integers(0, 256, size=(2, 16, 64, 64, 3),
                                       dtype=np.uint8))
    vis_cfg = vis.ViSConfig(num_outputs=7, input_dim=2048, depth=1, nheads=2,
                            dim_f=4, dim_s=4, dim_c=4, num_clusters=8)
    run = make_slide_program(resnet.random_params(jax.random.PRNGKey(0)),
                             vis_cfg, vis.init(vis_cfg, jax.random.PRNGKey(1)),
                             n_clusters=8, compute_dtype=jnp.float32)
    p1 = np.asarray(run(patches, jax.random.PRNGKey(0)))
    p2 = np.asarray(run(patches, jax.random.PRNGKey(0)))
    assert p1.shape == (7,) and np.isfinite(p1).all()
    np.testing.assert_array_equal(p1, p2)
    # different kmeans seed may change clustering -> may change predictions
    p3 = np.asarray(run(patches, jax.random.PRNGKey(3)))
    assert p3.shape == (7,)


@pytest.mark.slow
def test_slide_program_matches_staged_stages():
    """Fused device-resident pipeline == running the stages by hand."""
    from sequoia_tpu.ops import kmeans as km

    rng = np.random.default_rng(1)
    patches = jnp.asarray(rng.integers(0, 256, size=(2, 8, 64, 64, 3),
                                       dtype=np.uint8))
    rparams = resnet.random_params(jax.random.PRNGKey(0))
    vis_cfg = vis.ViSConfig(num_outputs=5, input_dim=2048, depth=1, nheads=2,
                            dim_f=4, dim_s=4, dim_c=4, num_clusters=6)
    vparams = vis.init(vis_cfg, jax.random.PRNGKey(1))
    run = make_slide_program(rparams, vis_cfg, vparams, n_clusters=6,
                             compute_dtype=jnp.float32)
    fused = np.asarray(run(patches, jax.random.PRNGKey(7)))

    # staged: extractor per batch -> kmeans -> cluster means -> ViS
    rcfg = resnet.ResNetConfig()
    feats = jnp.concatenate([
        resnet.extract_from_uint8(rcfg, rparams, patches[i])
        for i in range(2)])
    mask = jnp.ones((feats.shape[0],), bool)
    _, labels, _, _ = km.kmeans_fit(feats, mask, jax.random.PRNGKey(7),
                                    n_clusters=6)
    cf = km.cluster_means(feats, labels, mask, n_clusters=6)
    staged = np.asarray(vis.apply(vis_cfg, vparams, cf[None])[0])
    np.testing.assert_allclose(fused, staged, rtol=1e-4, atol=1e-4)


def test_fused_uni_backbone():
    """Fused device pipeline with the UNI backbone (tiny ViT cfg via the
    module default would be huge; use a small config through monkeypatched
    UniViTConfig defaults is overkill — instead run the real path at tiny
    image size by resizing 64px patches to 224 is too slow on CPU, so this
    exercises wiring with depth-2 via direct config injection)."""
    import jax.numpy as jnp

    from sequoia_tpu.models import uni_vit
    from sequoia_tpu.pipeline import fused

    # inject a tiny config by monkeypatching the constructor default
    tiny = uni_vit.UniViTConfig(img_size=32, patch_size=16, dim=16, depth=2,
                                heads=2, mlp_dim=32,
                                compute_dtype=jnp.float32)
    orig = uni_vit.UniViTConfig
    try:
        uni_vit.UniViTConfig = lambda **kw: tiny
        uparams = uni_vit.random_params(tiny, jax.random.PRNGKey(0))
        vis_cfg = vis.ViSConfig(num_outputs=4, input_dim=16, depth=1,
                                nheads=2, dim_f=4, dim_s=4, dim_c=4,
                                num_clusters=3)
        vparams = vis.init(vis_cfg, jax.random.PRNGKey(1))
        run = fused.make_slide_program(uparams, vis_cfg, vparams,
                                       n_clusters=3, backbone="uni",
                                       compute_dtype=jnp.float32)
        u8 = np.random.default_rng(0).integers(
            0, 256, (2, 8, 32, 32, 3), dtype=np.uint8)
        out = run(jnp.asarray(u8), jax.random.PRNGKey(2))
        assert out.shape == (4,) and np.isfinite(np.asarray(out)).all()
    finally:
        uni_vit.UniViTConfig = orig


def test_feature_extractor_mesh_matches_unsharded():
    """FeatureExtractor(mesh=...) — data-parallel extraction over an
    8-device mesh equals the single-device run, resnet and uni."""
    from sequoia_tpu.models import uni_vit
    from sequoia_tpu.parallel import sharding as sh
    from sequoia_tpu.pipeline.features import FeatureExtractor

    rng = np.random.default_rng(0)
    patches = rng.integers(0, 256, size=(20, 64, 64, 3), dtype=np.uint8)
    mesh = sh.make_mesh(n_data=8, n_model=1)

    rparams = resnet.random_params(jax.random.PRNGKey(0))
    ref = FeatureExtractor("resnet", rparams, batch_size=16, patch_size=64)(
        patches)
    got = FeatureExtractor("resnet", rparams, batch_size=16, patch_size=64,
                           mesh=mesh)(patches)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-2)

    ucfg = uni_vit.UniViTConfig(img_size=32, patch_size=16, dim=24, depth=1,
                                heads=2, mlp_dim=32)
    uparams = uni_vit.random_params(ucfg, jax.random.PRNGKey(1))
    small = rng.integers(0, 256, size=(20, 32, 32, 3), dtype=np.uint8)
    uref = FeatureExtractor("uni", uparams, batch_size=16, patch_size=32,
                            cfg=ucfg)(small)
    ugot = FeatureExtractor("uni", uparams, batch_size=16, patch_size=32,
                            cfg=ucfg, mesh=mesh)(small)
    np.testing.assert_allclose(ugot, uref, rtol=2e-3, atol=1e-2)

    with pytest.raises(ValueError, match="divisible"):
        FeatureExtractor("resnet", rparams, batch_size=12, mesh=mesh)
