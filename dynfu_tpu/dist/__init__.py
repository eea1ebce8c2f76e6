"""Multi-chip / multi-host layer.

Imports are LAZY (module __getattr__): `dynfu_tpu.dist.runtime` must be
importable without initializing the XLA backend, because
`jax.distributed.initialize` rejects any process whose backend is already
up — eagerly importing driver/engine_spmd/spmd here builds jnp constants
and broke the real 2-process rendezvous (tests/test_dist_runtime.py's
live-rendezvous test caught it).
"""

_EXPORTS = {
    "ShardedDynFusion": ("dynfu_tpu.dist.driver", "ShardedDynFusion"),
    "init_distributed": ("dynfu_tpu.dist.runtime", "init_distributed"),
    "is_primary": ("dynfu_tpu.dist.runtime", "is_primary"),
    "place_engine_state": ("dynfu_tpu.dist.engine_spmd", "place_engine_state"),
    "sharded_engine_frame": ("dynfu_tpu.dist.engine_spmd",
                             "sharded_engine_frame"),
    "sharded_fusion_frame": ("dynfu_tpu.dist.engine_spmd",
                             "sharded_fusion_frame"),
    "make_mesh": ("dynfu_tpu.dist.spmd", "make_mesh"),
    "shard_volume": ("dynfu_tpu.dist.spmd", "shard_volume"),
    "sharded_fusion_step": ("dynfu_tpu.dist.spmd", "sharded_fusion_step"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)
