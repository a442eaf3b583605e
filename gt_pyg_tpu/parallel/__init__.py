"""Parallelism: meshes, shard_map data parallelism, edge partitioning."""

from .mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharding,
    shard_batch_tree,
    replicate_tree,
)
from .data_parallel import (  # noqa: F401
    make_dp_train_step,
    make_dp_eval_step,
    make_stacked_shards,
    shard_graphs,
    stack_shards,
)
from .distributed import (  # noqa: F401
    initialize_distributed,
    global_mesh,
    local_batch_slice,
    scaling_efficiency,
)
from .edge_partition import (  # noqa: F401
    edge_partition_spec,
    shard_flat_batch,
    make_edge_partitioned_apply,
    make_edge_partitioned_train_step,
)
