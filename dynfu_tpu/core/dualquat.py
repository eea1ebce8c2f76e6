"""Dual-quaternion math as (..., 8) JAX arrays.

Layout: ``dq = [rw, rx, ry, rz, dw, dx, dy, dz]`` — real (rotation) quaternion
followed by dual (displacement) quaternion.

This module reproduces the *exact* semantics of the reference implementation
(``include/dynfu/utils/dual_quaternion.hpp`` in swarth100/dynfu), including its
behavioral quirks, because the reference's unit tests
(``test/quaternion_test.cpp``) and solver tests pin them:

* the (rotation, translation-vector) constructor normalizes the rotation with
  boost's Cayley norm, i.e. divides by |q|^2, not |q|
  (dual_quaternion.hpp:31,42-45);
* scalar multiplication scales the **dual part only** (dual_quaternion.hpp:120);
* ``normalize()`` rescales the **real part only** and leaves the dual part
  untouched (dual_quaternion.hpp:139-144);
* ``transformNormal`` applies the full rigid transform **including the
  translation**, identical to ``transformVertex`` (dual_quaternion.hpp:217-228).

All functions are elementwise over leading batch dims and vmap/jit friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# plain quaternion helpers (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_mul(q1, q2):
    """Hamilton product of quaternions stored as (..., 4) [w, x, y, z]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize_cayley(q):
    """boost::math normalize quirk: q / norm(q) where norm is |q|^2.

    Reference: dual_quaternion.hpp:31 (boost::math::norm is the Cayley norm).
    For unit quaternions this is a no-op, which is why the reference never
    notices; we replicate it for bit-level behavioral parity.
    """
    return q / jnp.sum(q * q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# dual quaternion constructors
# ---------------------------------------------------------------------------


def dq_make(real, dual):
    return jnp.concatenate([real, dual], axis=-1)


def dq_real(dq):
    return dq[..., 0:4]


def dq_dual(dq):
    return dq[..., 4:8]


def dq_identity(dtype=jnp.float32):
    """Identity transform: unit real, zero dual.

    Equals the reference's Euler ctor at all zeros (dual_quaternion.hpp:48-67),
    which is how both the warp field (warp_field.cpp:133) and node sampling
    (dyn_fusion.cpp:156) build their initial transforms.
    """
    return jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def dq_from_quat_translation(rot, t):
    """From rotation quaternion (...,4) and translation vector (...,3).

    real = rot / |rot|^2 (Cayley-norm quirk); dual = 0.5 * (0, t) * real.
    Reference: dual_quaternion.hpp:42-45.
    """
    real = quat_normalize_cayley(rot)
    tq = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    dual = 0.5 * quat_mul(tq, real)
    return dq_make(real, dual)


def dq_from_euler(yaw, pitch, roll, x, y, z):
    """From Euler angles and translation; reference dual_quaternion.hpp:48-67."""
    yaw, pitch, roll = jnp.asarray(yaw), jnp.asarray(pitch), jnp.asarray(roll)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)

    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    rot = jnp.stack([qw, qx, qy, qz], axis=-1)
    t = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(x, rot.dtype), qw.shape),
         jnp.broadcast_to(jnp.asarray(y, rot.dtype), qw.shape),
         jnp.broadcast_to(jnp.asarray(z, rot.dtype), qw.shape)],
        axis=-1,
    )
    return dq_from_quat_translation(rot, t)


def dq_from_rodrigues(rodrigues, t):
    """From an Euler-Rodrigues vector (tan(theta/2)*axis) and translation.

    theta = 2*atan(|r|); axis = r/|r|. Reference dual_quaternion.hpp:70-86.
    """
    rnorm = jnp.linalg.norm(rodrigues, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan(rnorm)
    axis = rodrigues / jnp.where(rnorm == 0, 1.0, rnorm)
    s = jnp.sin(0.5 * theta)
    rot = jnp.concatenate([jnp.cos(0.5 * theta), s * axis], axis=-1)
    # the reference double-normalizes (Cayley) before the (rot, t) ctor; both
    # are no-ops for the unit quaternion built above but we keep the order.
    return dq_from_quat_translation(quat_normalize_cayley(rot), t)


def dq_from_translation(t):
    """Pure-translation DQ: real identity, dual (0, t/2).

    Matches DualQuaternion(0,0,0,tx,ty,tz), the only constructor the solver
    result path uses (opt_solver.cpp:280-281).
    """
    t = jnp.asarray(t)
    shape = t.shape[:-1] + (1,)
    one = jnp.ones(shape, t.dtype)
    zero = jnp.zeros(shape, t.dtype)
    real = jnp.concatenate([one, zero, zero, zero], axis=-1)
    dual = jnp.concatenate([zero, 0.5 * t], axis=-1)
    return dq_make(real, dual)


# ---------------------------------------------------------------------------
# algebra
# ---------------------------------------------------------------------------


def dq_add(a, b):
    return a + b


def dq_sub(a, b):
    return a - b


def dq_scale(dq, s):
    """Scalar multiply: scales the DUAL part only (dual_quaternion.hpp:120)."""
    s = jnp.asarray(s)[..., None]
    return dq_make(dq_real(dq), dq_dual(dq) * s)


def dq_mul(a, b):
    """DQ product: (r1 r2, r1 d2 + d1 r2). Reference dual_quaternion.hpp:127-129."""
    r1, d1 = dq_real(a), dq_dual(a)
    r2, d2 = dq_real(b), dq_dual(b)
    return dq_make(quat_mul(r1, r2), quat_mul(r1, d2) + quat_mul(d1, r2))


def dq_conj(dq):
    return dq_make(quat_conj(dq_real(dq)), quat_conj(dq_dual(dq)))


def dq_normalize(dq):
    """Divide the REAL part by its Euclidean norm; dual untouched.

    Reference dual_quaternion.hpp:139-144 (sqrtf(dot(real,real))).
    """
    real = dq_real(dq)
    mag = jnp.sqrt(jnp.sum(real * real, axis=-1, keepdims=True))
    return dq_make(real / mag, dq_dual(dq))


def dq_normalize_joint(dq):
    """PROPER unit-dual-quaternion normalization: the WHOLE dq divided by
    |real| (Kavan et al. DLB). The reference's dq_normalize divides the
    real part only — harmless for its translation-only fields, wrong for
    blended rotations; the SE(3) solver path uses this one."""
    real = dq_real(dq)
    mag = jnp.sqrt(jnp.maximum(jnp.sum(real * real, axis=-1, keepdims=True),
                               1e-30))
    return dq / mag


def dq_rotate_vector(dq, v):
    """Rotate v (..., 3) by the dq's REAL quaternion only (the proper
    normal transform; the reference's dq_transform_normal applies the full
    transform, translation included — a quirk the parity path keeps)."""
    r = dq_real(dq)
    vq = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_mul(quat_mul(r, vq), quat_conj(r))[..., 1:4]


def dq_translation(dq):
    """Extract translation: vec(2 * dual * conj(real)). dual_quaternion.hpp:94-97."""
    q = quat_mul(2.0 * dq_dual(dq), quat_conj(dq_real(dq)))
    return q[..., 1:4]


# ---------------------------------------------------------------------------
# point / normal transforms
# ---------------------------------------------------------------------------


def _cross(a, b):
    return jnp.cross(a, b)


def dq_transform_point(dq, v):
    """Apply the rigid transform to points (..., 3).

    result = v + 2 rv x (rv x v + rw v) + 2 (rw dv - dw rv + rv x dv)
    Reference dual_quaternion.hpp:204-215.
    """
    rw = dq[..., 0:1]
    rv = dq[..., 1:4]
    dw = dq[..., 4:5]
    dv = dq[..., 5:8]
    return (
        v
        + 2.0 * _cross(rv, _cross(rv, v) + rw * v)
        + 2.0 * (rw * dv - dw * rv + _cross(rv, dv))
    )


def dq_transform_normal(dq, n):
    """Reference quirk: normals get the FULL transform incl. translation
    (dual_quaternion.hpp:217-228 is byte-identical to transformVertex)."""
    return dq_transform_point(dq, n)


# ---------------------------------------------------------------------------
# rotation extraction (roll/pitch/yaw, Rodrigues) — dual_quaternion.hpp:148-202
# ---------------------------------------------------------------------------


def dq_roll(dq):
    w, x, y, z = dq[..., 0], dq[..., 1], dq[..., 2], dq[..., 3]
    sinr = 2.0 * (w * x + y * z)
    cosr = 1.0 - 2.0 * (x * x + y * y)
    return jnp.arctan2(sinr, cosr)


def dq_pitch(dq):
    w, x, y, z = dq[..., 0], dq[..., 1], dq[..., 2], dq[..., 3]
    sinp = 2.0 * (w * y - z * x)
    return jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )


def dq_yaw(dq):
    w, x, y, z = dq[..., 0], dq[..., 1], dq[..., 2], dq[..., 3]
    siny = 2.0 * (w * z + x * y)
    cosy = 1.0 - 2.0 * (y * y + z * z)
    return jnp.arctan2(siny, cosy)


def dq_euler_angles(dq):
    """(roll, pitch, yaw) triple, matching getEulerAngles ordering."""
    return jnp.stack([dq_roll(dq), dq_pitch(dq), dq_yaw(dq)], axis=-1)


def dq_rodrigues(dq):
    """tan(theta/2) * axis with theta = 2 acos(rw). dual_quaternion.hpp:196-202."""
    w = dq[..., 0:1]
    q = dq[..., 1:4]
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arccos(jnp.clip(w, -1.0, 1.0))
    return jnp.tan(0.5 * theta) * q / jnp.where(norm == 0, 1.0, norm)
