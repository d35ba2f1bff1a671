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


def add_compile_cache_arg(parser) -> None:
    """--compilation_cache DIR on compute-heavy CLIs: persistent XLA
    executable cache so restarts (and fleet siblings sharing the dir) skip
    the ~25-40s backbone first-jit."""
    parser.add_argument(
        "--compilation_cache", type=str, default=None, metavar="DIR",
        help="persistent XLA compilation cache directory")


def apply_compile_cache(args) -> None:
    if getattr(args, "compilation_cache", None):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        # cache every program (the default min-compile-time gate would
        # skip the small aggregation programs)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
