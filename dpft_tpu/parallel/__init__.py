from dpft_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, data_sharding, replicated_sharding, data_parallel_size,
    maybe_initialize_distributed, process_local_indices,
    shard_dataset_for_process, make_global_batch,
)
from dpft_tpu.parallel.tp import (  # noqa: F401
    place_tensor_parallel, tp_spec_for_shape,
)
