from dynfu_tpu.dist.driver import ShardedDynFusion  # noqa: F401
from dynfu_tpu.dist.runtime import init_distributed, is_primary  # noqa: F401
from dynfu_tpu.dist.engine_spmd import (  # noqa: F401
    place_engine_state,
    sharded_engine_frame,
    sharded_fusion_frame,
)
from dynfu_tpu.dist.spmd import (  # noqa: F401
    make_mesh,
    shard_volume,
    sharded_fusion_step,
)
