from dpft_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, data_sharding, replicated_sharding, data_parallel_size,
)
