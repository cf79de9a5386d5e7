from vitax.parallel.distributed import init_distributed, process_info  # noqa: F401
from vitax.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    vit_param_shardings,
    resvit_param_shardings,
    shard_params,
    shard_batch,
    opt_state_shardings,
)
