from dynfu_tpu.volume.tsdf import (  # noqa: F401
    TsdfConfig,
    TsdfVolume,
    clear,
    create,
    extract_cloud,
    extract_normals,
    integrate,
    integrate_separable,
    interpolate,
    raycast,
    raycast_depth,
    raycast_separable,
)
