"""Device-resident whole-slide program smoke test (tiny shapes, CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from sequoia_tpu.models import resnet, vis
from sequoia_tpu.pipeline.fused import make_slide_program


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
