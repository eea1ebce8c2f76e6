from dynfu_tpu.rigid.icp import estimate_transform, build_pyramids  # noqa: F401
