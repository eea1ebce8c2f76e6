"""Dual-quaternion unit tests, ported 1:1 from the reference suite
(test/quaternion_test.cpp, 23 tests, tolerance 1e-4) so the math layer is
pinned to identical behavior."""

import math

import numpy as np
import pytest

from dynfu_tpu.core import dualquat as dq

RAD90 = math.pi / 2
RAD60 = math.pi / 3
RAD45 = math.pi / 4
RAD30 = math.pi / 6

TOL = 1e-4


@pytest.fixture(scope="module")
def fix():
    return {
        "dq90": dq.dq_from_euler(RAD90, RAD90, RAD90, 0.0, 0.0, 0.0),
        "dq45": dq.dq_from_euler(RAD45, RAD45, RAD45, 0.0, 0.0, 0.0),
        "dq0": dq.dq_from_euler(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        "dq30": dq.dq_from_euler(0.0, RAD30, 0.0, 0.0, 0.0, 100.0),
        "dq30rot": dq.dq_from_euler(0.0, RAD30, 0.0, 0.0, 0.0, 0.0),
        "dqmix": dq.dq_from_euler(RAD30, RAD45, RAD30, 30.0, 20.0, 10.0),
    }


def assert_dq(x, real, dual, tol=TOL):
    np.testing.assert_allclose(np.asarray(x[:4]), real, atol=tol)
    np.testing.assert_allclose(np.asarray(x[4:]), dual, atol=tol)


def test_real(fix):
    # quaternion_test.cpp:57-68 (vs online rotation calculator)
    np.testing.assert_allclose(
        np.asarray(dq.dq_real(fix["dq45"])),
        [0.8446231020115715, 0.19134170284356308, 0.4619399539487806, 0.19134170284356303],
        atol=TOL,
    )


def test_dual(fix):
    # quaternion_test.cpp:70-91
    assert_dq(fix["dq30"], [0.9659, 0.0, 0.2588, 0.0], [0.0, -12.9409, 0.0, 48.2962])


def test_from_rodrigues(fix):
    # quaternion_test.cpp:93-120
    t = np.zeros(3, np.float32)
    d30 = dq.dq_from_rodrigues(np.array([0.0, 0.267949192431123, 0.0], np.float32), t)
    d45 = dq.dq_from_rodrigues(
        np.array([0.226540919660986, 0.546918160678027, 0.226540919660986], np.float32), t
    )
    d90 = dq.dq_from_rodrigues(np.array([0.0, 1.0, 0.0], np.float32), t)
    np.testing.assert_allclose(np.asarray(dq.dq_real(d30)), np.asarray(dq.dq_real(fix["dq30rot"])), atol=TOL)
    np.testing.assert_allclose(np.asarray(dq.dq_real(d45)), np.asarray(dq.dq_real(fix["dq45"])), atol=TOL)
    np.testing.assert_allclose(np.asarray(dq.dq_real(d90)), np.asarray(dq.dq_real(fix["dq90"])), atol=TOL)


def test_sum(fix):
    # quaternion_test.cpp:123-142
    s = dq.dq_add(fix["dq45"], fix["dq30"])
    assert_dq(s, [1.8105, 0.1913, 0.7208, 0.1913], [0.0, -12.9410, 0.0, 48.2963])


def test_compose_rotations(fix):
    # quaternion_test.cpp:144-157
    v = np.array([0.0, 0.0, 1.0], np.float32)
    v1 = dq.dq_transform_point(fix["dq90"], v)
    v2 = dq.dq_transform_point(fix["dq90"], v1)
    vc = dq.dq_transform_point(dq.dq_mul(fix["dq90"], fix["dq90"]), v)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vc), atol=TOL)


def test_sum_assign(fix):
    # quaternion_test.cpp:159-180
    s = dq.dq_add(fix["dqmix"], fix["dq30"])
    assert_dq(s, [1.8536, 0.1353, 0.6778, 0.1353], [-6.8953, -0.3683, 7.5233, 57.6655])


def test_diff(fix):
    # quaternion_test.cpp:182-201
    d = dq.dq_sub(fix["dq45"], fix["dq30"])
    assert_dq(d, [-0.1213, 0.1913, 0.2031, 0.1913], [0.0, 12.9410, 0.0, -48.2963])


def test_diff_assign(fix):
    # quaternion_test.cpp:203-224
    d = dq.dq_sub(fix["dqmix"], fix["dq30"])
    assert_dq(d, [-0.0783, 0.1353, 0.1601, 0.1353], [-6.8953, 25.5137, 7.5233, -38.9271])


def test_scale_dual_only(fix):
    # quaternion_test.cpp:226-244 — scalar * scales the dual part only
    s = dq.dq_scale(fix["dq30"], 0.30)
    np.testing.assert_allclose(
        np.asarray(dq.dq_real(s)), np.asarray(dq.dq_real(fix["dq30"])), atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(dq.dq_dual(s)), [0.0, -3.8823, 0.0, 14.4889], atol=TOL
    )


def test_scale_assign(fix):
    # quaternion_test.cpp:246-266
    s = dq.dq_scale(fix["dqmix"], 0.30)
    np.testing.assert_allclose(
        np.asarray(dq.dq_dual(s)), [-2.0686, 3.7718, 2.2570, 2.8108], atol=TOL
    )


def test_mul(fix):
    # quaternion_test.cpp:268-287
    m = dq.dq_mul(fix["dq30"], fix["dq45"])
    assert_dq(m, [0.6963, 0.2343, 0.6648, 0.1353], [-6.7650, -33.2402, 11.7172, 34.8142])


def test_mul_assign(fix):
    # quaternion_test.cpp:289-309
    m = dq.dq_mul(fix["dqmix"], fix["dq30"])
    assert_dq(m, [0.7490, 0.0957, 0.6344, 0.1657], [-13.3911, 18.4657, -2.8031, 60.5945])


def test_normalize_real_only(fix):
    # quaternion_test.cpp:311-331 — normalize divides real by |real|, dual kept
    s = dq.dq_normalize(dq.dq_add(fix["dq45"], fix["dq30"]))
    assert_dq(s, [0.9203, 0.0973, 0.3663, 0.0973], [0.0, -12.9410, 0.0, 48.2963])


def test_do_not_transform(fix):
    v = dq.dq_transform_point(fix["dq0"], np.array([0.0, 0.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, 1.0], atol=TOL)


def test_rotate(fix):
    v = dq.dq_transform_point(fix["dq90"], np.array([0.0, 0.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(v), [1.0, 0.0, 0.0], atol=TOL)


def test_translate():
    d = dq.dq_from_euler(0.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    v = dq.dq_transform_point(d, np.array([0.0, 0.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(v), [1.0, 0.0, 1.0], atol=TOL)


def test_translate_and_rotate():
    d = dq.dq_from_euler(RAD90, RAD90, RAD90, 1.0, 0.0, 0.0)
    v = dq.dq_transform_point(d, np.array([0.0, 0.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(v), [2.0, 0.0, 0.0], atol=TOL)


# NOTE on the reference's RollTest/YawTest dq90 asserts: Euler(90,90,90)
# collapses to a pure 90-degree Y rotation (quaternion (c,0,c,0)) which sits at
# exact gimbal lock (pitch = pi/2). There roll and yaw are atan2(eps1, eps2) of
# float rounding noise — not a defined value — so we pin only the
# mathematically determined cases and pitch (which IS defined at the lock).


def test_roll(fix):
    assert abs(float(dq.dq_roll(fix["dq30rot"]))) < TOL
    assert abs(float(dq.dq_roll(fix["dq45"])) - RAD45) < TOL


def test_pitch(fix):
    assert abs(float(dq.dq_pitch(fix["dq30"])) - RAD30) < TOL
    assert abs(float(dq.dq_pitch(fix["dq45"])) - RAD45) < TOL
    assert abs(float(dq.dq_pitch(fix["dq90"])) - RAD90) < TOL


def test_yaw(fix):
    assert abs(float(dq.dq_yaw(fix["dq30rot"]))) < TOL
    assert abs(float(dq.dq_yaw(fix["dq45"])) - RAD45) < TOL


def test_euler_angles(fix):
    e30 = np.asarray(dq.dq_euler_angles(fix["dq30rot"]))
    e45 = np.asarray(dq.dq_euler_angles(fix["dq45"]))
    np.testing.assert_allclose(e30, [0.0, RAD30, 0.0], atol=TOL)
    np.testing.assert_allclose(e45, [RAD45, RAD45, RAD45], atol=TOL)
    # dq90: only pitch is defined at the gimbal lock
    assert abs(float(dq.dq_pitch(fix["dq90"])) - RAD90) < TOL


def test_rodrigues(fix):
    np.testing.assert_allclose(
        np.asarray(dq.dq_rodrigues(fix["dq30rot"])), [0.0, 0.267949192431123, 0.0], atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(dq.dq_rodrigues(fix["dq45"])),
        [0.226540919660986, 0.546918160678027, 0.226540919660986],
        atol=TOL,
    )
    np.testing.assert_allclose(
        np.asarray(dq.dq_rodrigues(fix["dq90"])), [0.0, 1.0, 0.0], atol=TOL
    )


def test_translation_extraction(fix):
    # getTranslation: vec(2 * dual * conj(real))
    np.testing.assert_allclose(
        np.asarray(dq.dq_translation(fix["dq30"])), [0.0, 0.0, 100.0], atol=1e-3
    )


def test_batched_ops_vmap(fix):
    """New-framework property: every op is batched (the reference looped on CPU)."""
    import jax

    batch = np.stack([np.asarray(fix["dq30"]), np.asarray(fix["dq45"])])
    pts = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], np.float32)
    out = jax.vmap(dq.dq_transform_point)(batch, pts)
    ref0 = dq.dq_transform_point(fix["dq30"], pts[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0), atol=1e-6)
