from g4splat_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    data_parallel_train_step,
)
