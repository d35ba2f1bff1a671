from sequoia_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, shard_batch_arrays, shard_params, replicate)
