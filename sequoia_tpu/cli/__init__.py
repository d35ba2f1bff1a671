"""CLI package.

``SEQUOIA_JAX_PLATFORM`` (e.g. ``cpu``) overrides the JAX platform before
any backend initializes — useful on hosts whose site config pins
``JAX_PLATFORMS`` to a TPU plugin, or for running the host-only stages
without claiming a TPU.
"""

import os

_platform = os.environ.get("SEQUOIA_JAX_PLATFORM")
if _platform:
    import jax

    try:
        jax.config.update("jax_platforms", _platform)
    except Exception:
        pass
