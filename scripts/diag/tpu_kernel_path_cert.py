"""TPU certification of the kernel-path sharded engine frame (VERDICT r4
#8): run `sharded_engine_frame(kernel_path=True)` on a REAL 1-device TPU
mesh — shard_map with n=1 still executes the composed Pallas sections
(fused warp kernel, tiered correspondence sweep incl. the Pallas
resident-point 1-NN, Gram assembly + psum) — and assert equivalence with
the single-chip engine frame. On the CPU virtual mesh the correspondence
section falls back to the XLA formulation (dist/engine_spmd.py), so this
run is the only place the composed Pallas corr executes under shard_map.

Run: /opt/venv/bin/python scripts/diag/tpu_kernel_path_cert.py
Emits one JSON line suitable for the measurement artifact log.
"""

import json
import sys

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.dist.engine_spmd import (  # noqa: E402
    place_engine_state, sharded_engine_frame)
from dynfu_tpu.engine.dynfusion import DynFusion, _nonrigid_frame  # noqa: E402
from dynfu_tpu.engine.params import DynFuParams, KinFuParams  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402


def main() -> int:
    assert jax.default_backend() == "tpu", "this certification needs TPU"
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))

    rows, cols = 240, 320
    intr = Intr(262.5, 262.5, cols / 2 - 0.5, rows / 2 - 0.5)
    params = DynFuParams(
        kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                          volume_dims=(128, 128, 128)),
        max_vertices=3 << 14, max_mc_voxels=1 << 13,
        max_nodes=256, max_new_nodes=64,
    )
    engine = DynFusion(params)
    d0 = sphere_depth((0.0, 0.0, 1.5), 0.5, rows, cols,
                      intr.fx, intr.fy, intr.cx, intr.cy)
    d1 = sphere_depth((0.008, 0.0, 1.5), 0.5, rows, cols,
                      intr.fx, intr.fy, intr.cx, intr.cy)
    engine(d0)

    dp, cfg = engine.dynfu_params, engine.tsdf_config
    c, pose = engine.canonical, engine.poses[-1]
    pose = (jnp.asarray(pose[0], jnp.float32),
            jnp.asarray(pose[1], jnp.float32))
    args = (engine.vol, engine.warpfield, c.vertices, c.normals, c.mask,
            jnp.asarray(d1, jnp.int32), pose)

    ref = _nonrigid_frame(*args, dp=dp, intr=intr, config=cfg,
                          strict_parity=True, integrate_mode="separable")

    # interpret=False on TPU: the REAL Pallas kernels inside shard_map,
    # including the corr sweep (the CPU mesh's documented fallback)
    step = sharded_engine_frame(mesh, dp, intr, cfg, strict_parity=True,
                                kernel_path=True, interpret=False)
    got = step(*place_engine_state(mesh, *args))

    n_ref, n_got = int(ref[8]), int(got[8])
    wv_err = float(np.nanmax(np.abs(np.asarray(got[2]) - np.asarray(ref[2]))))
    dq_err = float(np.nanmax(np.abs(np.asarray(got[1].dqs)
                                    - np.asarray(ref[1].dqs))))
    mask_eq = bool(np.array_equal(np.asarray(got[1].mask),
                                  np.asarray(ref[1].mask)))
    ok = (n_ref == n_got and wv_err < 1e-4 and dq_err < 1e-4 and mask_eq
          and int(got[9].corr_dropped) == int(ref[9].corr_dropped) == 0)
    print(json.dumps({
        "metric": "tpu_kernel_path_cert",
        "value": 1.0 if ok else 0.0,
        "unit": "pass",
        "vs_baseline": 1.0 if ok else 0.0,
        "n_verts": n_got,
        "warped_max_abs_diff": wv_err,
        "node_dq_max_abs_diff": dq_err,
        "node_mask_equal": mask_eq,
        "devices": 1,
        "backend": jax.default_backend(),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
