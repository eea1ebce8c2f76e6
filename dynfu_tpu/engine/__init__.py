from dynfu_tpu.engine.params import KinFuParams, DynFuParams  # noqa: F401
