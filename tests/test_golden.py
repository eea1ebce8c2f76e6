"""Golden end-to-end regression: fixed synthetic sequence, recorded output
statistics. Catches silent behavioral drift that property-based tests miss
(the reference has no analog — its only e2e check was eyeballing the demo).

Tolerances allow float reassociation across backends/compilers but not
algorithmic change.
"""

import numpy as np

from dynfu_tpu.engine.dynfusion import DynFusion


def test_golden_three_frame_sequence():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import CENTER, RADIUS, small_dynfu_params, sphere_depth

    df = DynFusion(small_dynfu_params())
    for i in range(3):
        df(sphere_depth((CENTER[0] + 0.004 * i, CENTER[1], CENTER[2]), RADIUS))

    wv, wm = df.warped_cloud()
    v = np.asarray(wv)[np.asarray(wm)]

    # recorded 2026-08-17 (round 1); see git history for provenance
    assert abs(len(v) - 3654) <= 80
    np.testing.assert_allclose(
        v.mean(0), [0.50952, 0.50885, 0.32657], atol=2e-3
    )
    np.testing.assert_allclose(
        v.std(0), [0.08723, 0.08730, 0.02344], atol=2e-3
    )
    assert abs(int(df.warpfield.count) - 115) <= 6
    trans = np.asarray(df.warpfield.dqs)[:, 5:8][np.asarray(df.warpfield.mask)]
    np.testing.assert_allclose(
        trans.mean(0) * 2, [1.554e-4, -1.537e-5, 3.466e-5], atol=5e-4
    )
