"""Pose math core: Euler/quaternion/matrix conversions, 3DTK conventions.

Re-implements the semantics of the reference's header-only math core
(``include/slam6d/globals.icc:282-651``) on JAX arrays.  Conventions:

- Coordinate system: left-handed, y-up, z-depth, centimetre units
  (ref: doc/high_level_doc/documentation.tex:454-492).
- The reference stores 4x4 matrices as OpenGL *column-major* 16-vectors
  ``M[col*4 + row]``.  Here a pose is a standard ``(4, 4)`` array ``T``
  with ``p' = T @ [p, 1]`` (i.e. ``T[row, col] = M16[col*4 + row]``);
  :func:`from_colmajor16` / :func:`to_colmajor16` convert at file-format
  boundaries (.pose / .frames).
- Euler convention matches ``EulerToMatrix4`` (globals.icc:504-538) and
  ``Matrix4ToEuler`` (globals.icc:540-583) element-for-element, including
  the gimbal-lock branches, so .pose files round-trip identically.

Everything is pure and jit/vmap-compatible (branches via jnp.where).
Functions accept numpy or jax arrays; float64 by default (package enables
x64) so host-side pose chains match the reference's double math.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "euler_to_matrix3",
    "euler_to_matrix4",
    "matrix4_to_euler",
    "matrix4_to_quat",
    "quat_to_matrix3",
    "quat_to_matrix4",
    "from_colmajor16",
    "to_colmajor16",
    "m4inv",
    "transform3",
    "transform3normal",
    "pose_to_matrix",
    "matrix_to_pose",
    "rad",
    "deg",
]


def rad(x):
    """Degrees -> radians (ref globals.icc ``rad``)."""
    return jnp.asarray(x) * (jnp.pi / 180.0)


def deg(x):
    """Radians -> degrees (ref globals.icc ``deg``)."""
    return jnp.asarray(x) * (180.0 / jnp.pi)


def euler_to_matrix3(theta):
    """3x3 rotation from 3DTK Euler angles (ref globals.icc:361-383).

    theta: (..., 3) angles [theta_x, theta_y, theta_z] in radians.
    Returns (..., 3, 3) rotation with the exact element layout of
    ``EulerToMatrix3`` (note: reference writes column-major; transposed
    here into standard [row, col]).
    """
    theta = jnp.asarray(theta)
    sx, sy, sz = (jnp.sin(theta[..., i]) for i in range(3))
    cx, cy, cz = (jnp.cos(theta[..., i]) for i in range(3))
    # reference alignxf[k] = column-major; R[row, col]:
    r00 = cy * cz
    r10 = sx * sy * cz + cx * sz
    r20 = -cx * sy * cz + sx * sz
    r01 = -cy * sz
    r11 = -sx * sy * sz + cx * cz
    r21 = cx * sy * sz + sx * cz
    r02 = sy
    r12 = -sx * cy
    r22 = cx * cy
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def euler_to_matrix4(pos, theta):
    """4x4 pose from position + 3DTK Euler angles (ref globals.icc:504-538)."""
    pos = jnp.asarray(pos)
    R = euler_to_matrix3(theta)
    batch = jnp.broadcast_shapes(pos.shape[:-1], R.shape[:-2])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(pos)
    T = T.at[..., 3, 3].set(1.0)
    return T


def matrix4_to_euler(T):
    """Inverse of euler_to_matrix4, exact branch structure of
    ``Matrix4ToEuler`` (ref globals.icc:540-583).

    T: (..., 4, 4). Returns (theta (...,3), pos (...,3)).

    Column-major index map: alignxf[0]=T[0,0], alignxf[4]=T[0,1],
    alignxf[8]=T[0,2], alignxf[9]=T[1,2], alignxf[10]=T[2,2],
    alignxf[1]=T[1,0], alignxf[5]=T[1,1].
    """
    T = jnp.asarray(T)
    a0 = T[..., 0, 0]
    a8 = jnp.clip(T[..., 0, 2], -1.0, 1.0)
    th_y = jnp.where(a0 > 0.0, jnp.arcsin(a8), jnp.pi - jnp.arcsin(a8))
    C = jnp.cos(th_y)
    gimbal = jnp.abs(C) <= 0.005
    Csafe = jnp.where(gimbal, 1.0, C)
    # non-gimbal branch
    th_x = jnp.arctan2(-T[..., 1, 2] / Csafe, T[..., 2, 2] / Csafe)
    th_z = jnp.arctan2(-T[..., 0, 1] / Csafe, T[..., 0, 0] / Csafe)
    # gimbal branch: x = 0, z from alignxf[5], alignxf[1]
    th_x = jnp.where(gimbal, 0.0, th_x)
    th_z = jnp.where(gimbal, jnp.arctan2(T[..., 1, 0], T[..., 1, 1]), th_z)
    theta = jnp.stack([th_x, th_y, th_z], axis=-1)
    pos = T[..., :3, 3]
    return theta, pos


def matrix4_to_quat(T):
    """Rotation part -> unit quaternion [w, x, y, z].

    Matches ``Matrix4ToQuat`` (ref globals.icc:586-651: max-diagonal
    selection, Shepperd's method) up to the global sign of q.  Branchless
    four-candidate formulation for jit.
    """
    T = jnp.asarray(T)
    m00, m11, m22 = T[..., 0, 0], T[..., 1, 1], T[..., 2, 2]
    tr = m00 + m11 + m22
    # candidate magnitudes
    qw2 = jnp.maximum(0.0, 1.0 + tr) / 4.0
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22) / 4.0
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22) / 4.0
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22) / 4.0
    # off-diagonal sums/differences (standard [row,col] layout)
    r21_r12 = T[..., 2, 1] - T[..., 1, 2]
    r02_r20 = T[..., 0, 2] - T[..., 2, 0]
    r10_r01 = T[..., 1, 0] - T[..., 0, 1]
    r10p = T[..., 1, 0] + T[..., 0, 1]
    r02p = T[..., 0, 2] + T[..., 2, 0]
    r21p = T[..., 2, 1] + T[..., 1, 2]

    def norm(q):
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    qs = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(qs, axis=-1)
    sw = jnp.sqrt(jnp.maximum(qw2, 1e-30))
    sx = jnp.sqrt(jnp.maximum(qx2, 1e-30))
    sy = jnp.sqrt(jnp.maximum(qy2, 1e-30))
    sz = jnp.sqrt(jnp.maximum(qz2, 1e-30))
    cand_w = jnp.stack([sw, r21_r12 / (4 * sw), r02_r20 / (4 * sw), r10_r01 / (4 * sw)], -1)
    cand_x = jnp.stack([r21_r12 / (4 * sx), sx, r10p / (4 * sx), r02p / (4 * sx)], -1)
    cand_y = jnp.stack([r02_r20 / (4 * sy), r10p / (4 * sy), sy, r21p / (4 * sy)], -1)
    cand_z = jnp.stack([r10_r01 / (4 * sz), r02p / (4 * sz), r21p / (4 * sz), sz], -1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return norm(q)


def quat_to_matrix3(q):
    """Unit quaternion [w,x,y,z] -> 3x3 rotation (ref icp6Dquat.cc:149-169
    ``quaternion2matrix``)."""
    q = jnp.asarray(q)
    w, x, y, z = (q[..., i] for i in range(4))
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wz, xz, yz = w * z, x * z, y * z
    wy, xy, wx = w * y, x * y, w * x
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], -1),
        ],
        axis=-2,
    )


def quat_to_matrix4(q, pos=None):
    q = jnp.asarray(q)
    R = quat_to_matrix3(q)
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    if pos is not None:
        T = T.at[..., :3, 3].set(jnp.asarray(pos))
    T = T.at[..., 3, 3].set(1.0)
    return T


def from_colmajor16(m16):
    """OpenGL column-major 16-vector (the reference's in-memory & .frames
    layout) -> (4,4) standard matrix."""
    m16 = jnp.asarray(m16)
    return m16.reshape(m16.shape[:-1] + (4, 4)).swapaxes(-1, -2)


def to_colmajor16(T):
    """(4,4) standard matrix -> column-major 16-vector."""
    T = jnp.asarray(T)
    return T.swapaxes(-1, -2).reshape(T.shape[:-2] + (16,))


def m4inv(T):
    """Inverse of a rigid 4x4 pose (ref globals.icc ``M4inv``).

    Uses the rigid-body closed form R^T, -R^T t (the reference computes a
    general adjugate inverse; for the pose matrices used everywhere the
    results agree to rounding).
    """
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform3(T, pts):
    """Apply pose to points (ref globals.icc ``transform3``/``PMult``).

    T: (..., 4, 4); pts: (..., N, 3) -> (..., N, 3).
    """
    T = jnp.asarray(T)
    pts = jnp.asarray(pts)
    return (
        jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]
    )


def transform3normal(T, normals):
    """Apply rotation only (ref globals.icc ``transform3normal``)."""
    T = jnp.asarray(T)
    normals = jnp.asarray(normals)
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], normals)


def pose_to_matrix(pos, theta_deg):
    """.pose file semantics: position + Euler angles in degrees -> 4x4
    (ref src/scanio/scan_io.cc readPose + scan.cc:268-279)."""
    return euler_to_matrix4(jnp.asarray(pos), rad(jnp.asarray(theta_deg)))


def matrix_to_pose(T):
    """4x4 -> (pos, theta_degrees), inverse of pose_to_matrix."""
    theta, pos = matrix4_to_euler(T)
    return pos, deg(theta)
