from sequoia_tpu.ops import nn  # noqa: F401
