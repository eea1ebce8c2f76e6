"""Gate study: min_update variants vs tracking/static accuracy (CPU, 64-cube).

Reproduces the numbers recorded in solver/gn.py::solve — run with
/opt/venv/bin/python scripts/fusion_gate_study.py (forces the CPU backend)."""
import jax; jax.config.update("jax_platforms", "cpu")
import sys, dataclasses
sys.path.insert(0, "/root/repo/tests")
import numpy as np
from test_pipeline import CENTER, RADIUS, small_dynfu_params, sphere_depth, surface_error
from dynfu_tpu.engine.dynfusion import DynFusion

VOL_T = np.asarray((-0.5, -0.5, 0.25))
N = 12

def run(tag, moving, **kw):
    params = dataclasses.replace(small_dynfu_params(), **kw)
    df = DynFusion(params, mode="fusion")
    for i in range(N):
        cx0 = CENTER[0] + (0.004*i if moving else 0.0)
        df(sphere_depth((cx0, CENTER[1], CENTER[2]), RADIUS))
    cv, cm = df.canonical.vertices, np.asarray(df.canonical.mask)
    cerr = np.median(surface_error(cv, cm, np.asarray(CENTER) - VOL_T, RADIUS))*1e3
    cen_live = np.asarray((CENTER[0] + (0.004*(N-1) if moving else 0.0),
                           CENTER[1], CENTER[2])) - VOL_T
    wv, wm = df.warped_cloud()
    werr = np.median(surface_error(wv, np.asarray(wm), cen_live, RADIUS))*1e3
    print(f"{tag}: canonical {cerr:.3f} mm  warped {werr:.3f} mm")

run("HARD deadband, static", False)
run("HARD deadband, moving", True)
run("se3 defaults, static", False, solver_rotations=True)
run("se3 defaults, moving", True, solver_rotations=True)
