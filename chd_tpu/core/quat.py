"""Batched quaternion math as pure jnp functions.

Quaternions are plain ``(..., 4)`` arrays in ``(w, x, y, z)`` order, so every
op is trivially jit/vmap/grad-compatible (no wrapper class, unlike the
reference's ndarray wrapper at src/skeleton_fitting/ik/Quaternions.py).

Semantics match the reference exactly where the pipeline depends on them:
Hamilton product (reference Quaternions.__mul__, :70-117), euler extraction
for orders 'xyz'/'yzx' (:215-233), ``from_euler(order, world)`` composition
(:408-420), branch-selected ``from_transforms`` (:423-464), and the
epsilon-guarded ``angle_axis`` (:289-298) / ``exp`` (:351-363).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------


def identity(shape=(), dtype=jnp.float32):
    """Identity quaternion(s) with leading dims ``shape``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def conjugate(q):
    """Quaternion inverse for unit quaternions (negated imaginary part)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


inverse = conjugate


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mul(a, b):
    """Hamilton product a ⊗ b (broadcasting)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotate(q, v):
    """Rotate 3-vectors ``v`` by quaternions ``q`` (q ⊗ v ⊗ q⁻¹).

    Uses the expanded cross-product form (cheaper than two quaternion
    products): v' = v + 2 w (u × v) + 2 u × (u × v).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def abs_pole(q):
    """Flip each quaternion into the w >= 0 hemisphere (reference __abs__)."""
    return jnp.where(q[..., :1] < 0.0, -q, q)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------


def from_angle_axis(angle, axis):
    """Unit quaternion from rotation ``angle`` about (auto-normalized) axis.

    Matches reference from_angle_axis (Quaternions.py:401-405) incl. the
    1e-10 normalization guard.
    """
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-10)
    half = jnp.asarray(angle)[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def to_angle_axis(q):
    """(angle, axis) with the same epsilon guard as the reference (:289-298)."""
    q = normalize(q)
    w = q[..., 0]
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    s = jnp.where(s == 0.0, 0.001, s)
    angle = 2.0 * jnp.arccos(jnp.clip(w, -1.0, 1.0))
    axis = q[..., 1:] / s[..., None]
    return angle, axis


_AXES = {
    "x": jnp.array([1.0, 0.0, 0.0]),
    "y": jnp.array([0.0, 1.0, 0.0]),
    "z": jnp.array([0.0, 0.0, 1.0]),
}


def from_euler(es, order="xyz", world=False):
    """Compose per-axis rotations of euler angles ``es`` (..., 3).

    ``world=False`` → q(order[0]) ⊗ q(order[1]) ⊗ q(order[2]);
    ``world=True``  → q(order[2]) ⊗ q(order[1]) ⊗ q(order[0])
    (reference Quaternions.from_euler, :408-420).
    """
    es = jnp.asarray(es)
    q0 = from_angle_axis(es[..., 0], _AXES[order[0]].astype(es.dtype))
    q1 = from_angle_axis(es[..., 1], _AXES[order[1]].astype(es.dtype))
    q2 = from_angle_axis(es[..., 2], _AXES[order[2]].astype(es.dtype))
    return mul(q2, mul(q1, q0)) if world else mul(q0, mul(q1, q2))


def to_euler(q, order="xyz"):
    """Euler extraction for orders 'xyz' and 'yzx' (reference euler, :215-233).

    For 'xyz' the returned (ex, ey, ez) satisfy
    ``from_euler((ex,ey,ez), 'xyz', world=True) == q`` (i.e. R = Rz·Ry·Rx).
    """
    q = normalize(q)
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    if order == "xyz":
        e0 = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        e1 = jnp.arcsin(jnp.clip(2 * (q0 * q2 - q3 * q1), -1.0, 1.0))
        e2 = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        e0 = jnp.arctan2(2 * (q1 * q0 - q2 * q3), -q1 * q1 + q2 * q2 - q3 * q3 + q0 * q0)
        e1 = jnp.arctan2(2 * (q2 * q0 - q1 * q3), q1 * q1 - q2 * q2 - q3 * q3 + q0 * q0)
        e2 = jnp.arcsin(jnp.clip(2 * (q1 * q2 + q3 * q0), -1.0, 1.0))
    else:
        raise NotImplementedError(f"euler order {order!r} not supported")
    return jnp.stack([e0, e1, e2], axis=-1)


def to_matrix(q):
    """3×3 rotation matrices (reference transforms, :301-324)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, yz, xz = x * y2, y * z2, x * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_matrix(m):
    """Rotation matrix → quaternion via the 4-branch max selection used by the
    reference (from_transforms, :423-464). Accepts (..., 3, 3) or (..., 4, 4).
    """
    d0, d1, d2 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q0 = jnp.sqrt(jnp.clip((d0 + d1 + d2 + 1.0) / 4.0, 0.0, None))
    q1 = jnp.sqrt(jnp.clip((d0 - d1 - d2 + 1.0) / 4.0, 0.0, None))
    q2 = jnp.sqrt(jnp.clip((-d0 + d1 - d2 + 1.0) / 4.0, 0.0, None))
    q3 = jnp.sqrt(jnp.clip((-d0 - d1 + d2 + 1.0) / 4.0, 0.0, None))

    c0 = (q0 >= q1) & (q0 >= q2) & (q0 >= q3)
    c1 = (q1 >= q0) & (q1 >= q2) & (q1 >= q3) & ~c0
    c2 = (q2 >= q0) & (q2 >= q1) & (q2 >= q3) & ~c0 & ~c1
    # remaining branch: q3 largest

    s21 = jnp.sign(m[..., 2, 1] - m[..., 1, 2])
    s02 = jnp.sign(m[..., 0, 2] - m[..., 2, 0])
    s10 = jnp.sign(m[..., 1, 0] - m[..., 0, 1])
    a10 = jnp.sign(m[..., 1, 0] + m[..., 0, 1])
    a02 = jnp.sign(m[..., 0, 2] + m[..., 2, 0])
    a21 = jnp.sign(m[..., 2, 1] + m[..., 1, 2])

    b0 = jnp.stack([q0, q1 * s21, q2 * s02, q3 * s10], axis=-1)
    b1 = jnp.stack([q0 * s21, q1, q2 * a10, q3 * a02], axis=-1)
    b2 = jnp.stack([q0 * s02, q1 * a10, q2, q3 * a21], axis=-1)
    b3 = jnp.stack([q0 * s10, q1 * a02, q2 * a21, q3], axis=-1)

    out = jnp.where(
        c0[..., None], b0, jnp.where(c1[..., None], b1, jnp.where(c2[..., None], b2, b3))
    )
    return out


def between(v0, v1):
    """Shortest-arc rotation taking v0 to v1 (reference between, :395-398)."""
    a = jnp.cross(v0, v1)
    w = jnp.sqrt(jnp.sum(v0 * v0, axis=-1) * jnp.sum(v1 * v1, axis=-1)) + jnp.sum(
        v0 * v1, axis=-1
    )
    return normalize(jnp.concatenate([w[..., None], a], axis=-1))


def exp(w):
    """so(3) vector → quaternion (reference exp, :351-363, eps 0.001 guard)."""
    t = jnp.sqrt(jnp.sum(w * w, axis=-1))
    t = jnp.where(t == 0.0, 0.001, t)
    s = jnp.sin(t) / t
    q = jnp.concatenate([jnp.cos(t)[..., None], w * s[..., None]], axis=-1)
    return normalize(q)


def log(q):
    """Quaternion → so(3) vector (reference log, :176-181)."""
    n = abs_pole(normalize(q))
    img = n[..., 1:]
    lens = jnp.sqrt(jnp.sum(img * img, axis=-1))
    scale = jnp.arctan2(lens, n[..., 0]) / (lens + 1e-10)
    return img * scale[..., None]


def slerp(q0, q1, a):
    """Spherical linear interpolation with the reference's linear fallback for
    nearly-parallel quaternions (Quaternions.slerp, :366-392)."""
    a = jnp.asarray(a)
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0.0, -q1, q1)
    d = jnp.abs(d)
    linear = (1.0 - d) < 0.01
    omega = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sinom = jnp.where(linear, 1.0, jnp.sin(omega))
    w0 = jnp.where(linear, 1.0 - a, jnp.sin((1.0 - a) * omega) / sinom)
    w1 = jnp.where(linear, a, jnp.sin(a * omega) / sinom)
    return w0[..., None] * q0 + w1[..., None] * q1
