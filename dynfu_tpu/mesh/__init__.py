from dynfu_tpu.mesh.mc import marching_cubes, MAX_TRIANGLES  # noqa: F401
