from otto_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    make_mesh,
    data_sharding,
    replicated_sharding,
    row_sharding,
)
