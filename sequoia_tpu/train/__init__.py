from sequoia_tpu.train import checkpoint, loop  # noqa: F401
