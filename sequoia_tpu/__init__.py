"""sequoia_tpu: TPU-native rebuild of the SEQUOIA pathology-to-transcriptome pipeline.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
gevaertlab/sequoia-pub (reference mounted at /root/reference), redesigned
TPU-first:

- Pure-functional model definitions (``sequoia_tpu.models``): ViS (the
  SummaryMixing linearized transformer), ViT (softmax-attention benchmark
  variant), HE2RNA (MLP baseline), plus the feature-extraction backbones
  (ResNet-50, UNI ViT-L/16) — all jittable, shardable, and weight-compatible
  with the reference's released PyTorch checkpoints via
  ``sequoia_tpu.models.convert``.
- Device-side compute ops (``sequoia_tpu.ops``): tissue masking, batched
  k-means, statistics — written as XLA-friendly jnp programs with Pallas
  kernels on the hot paths.
- Sharding utilities (``sequoia_tpu.parallel``): ``jax.sharding.Mesh`` based
  data/model parallelism over ICI.
- A host data plane (``sequoia_tpu.data``): ref-file parsing, patient-level
  CV splits (split parity with the reference), HDF5 feature stores, and a
  prefetching loader feeding device-resident training steps.
- Pipeline stages (``sequoia_tpu.pipeline``): tiling, feature extraction,
  k-means aggregation, spatial sliding-window visualization — same on-disk
  contracts (patches HDF5, features ``.h5``, ``test_results.pkl``,
  ``stride-1.csv``) as the reference.
"""

__version__ = "0.1.0"

import os as _os

_platform = (_os.environ.get("SEQUOIA_JAX_PLATFORM")
             or _os.environ.get("SEQUOIA_PLATFORM"))
if _platform:
    # User-facing platform override (e.g. SEQUOIA_JAX_PLATFORM=cpu to run
    # the example pipeline host-side).  Needed because host images may pin
    # JAX_PLATFORMS to a TPU plugin via sitecustomize BEFORE user env vars
    # are consulted; jax.config wins if applied pre-backend-init.  Also
    # applied in cli/__init__.py; here it covers library imports too.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _platform)
    except Exception as _e:
        # backend already initialized — too late to switch; the explicit
        # override is being IGNORED, which must not be silent
        import sys as _sys
        print(f"sequoia_tpu: SEQUOIA_JAX_PLATFORM={_platform} ignored "
              f"(JAX backend already initialized: {_e})", file=_sys.stderr)
