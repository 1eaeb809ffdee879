"""Math core tests: conventions of globals.icc must round-trip."""

import numpy as np
import pytest

from tpu3dtk.core import math3d


def _ref_euler_to_matrix4(rPos, rPosTheta):
    """Direct transliteration of EulerToMatrix4 (globals.icc:504-538),
    column-major output, used as oracle."""
    sx, sy, sz = np.sin(rPosTheta)
    cx, cy, cz = np.cos(rPosTheta)
    m = np.zeros(16)
    m[0] = cy * cz
    m[1] = sx * sy * cz + cx * sz
    m[2] = -cx * sy * cz + sx * sz
    m[4] = -cy * sz
    m[5] = -sx * sy * sz + cx * cz
    m[6] = cx * sy * sz + sx * cz
    m[8] = sy
    m[9] = -sx * cy
    m[10] = cx * cy
    m[12:15] = rPos
    m[15] = 1.0
    return m


@pytest.mark.parametrize("seed", range(5))
def test_euler_to_matrix4_matches_reference_formula(seed):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-100, 100, 3)
    theta = rng.uniform(-np.pi, np.pi, 3)
    ours = np.asarray(math3d.euler_to_matrix4(pos, theta))
    ref16 = _ref_euler_to_matrix4(pos, theta)
    ref = np.asarray(math3d.from_colmajor16(ref16))
    np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("seed", range(10))
def test_euler_matrix_roundtrip(seed):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1000, 1000, 3)
    # keep away from the gimbal branch for exact roundtrip
    theta = rng.uniform(-1.4, 1.4, 3)
    T = math3d.euler_to_matrix4(pos, theta)
    theta2, pos2 = math3d.matrix4_to_euler(T)
    T2 = math3d.euler_to_matrix4(pos2, theta2)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-10)


def test_matrix_roundtrip_through_euler_gimbal():
    # y-rotation at +-pi/2: matrix must still round-trip through angles
    for sy in (np.pi / 2, -np.pi / 2):
        T = math3d.euler_to_matrix4(np.zeros(3), np.array([0.3, sy, -0.2]))
        theta, pos = math3d.matrix4_to_euler(T)
        T2 = math3d.euler_to_matrix4(pos, theta)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        theta = rng.uniform(-np.pi, np.pi, 3)
        T = math3d.euler_to_matrix4(np.zeros(3), theta)
        q = math3d.matrix4_to_quat(T)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-12)
        R2 = math3d.quat_to_matrix3(q)
        np.testing.assert_allclose(
            np.asarray(R2), np.asarray(T)[:3, :3], atol=1e-10
        )


def test_m4inv_and_transform3():
    rng = np.random.default_rng(1)
    T = math3d.euler_to_matrix4(rng.uniform(-10, 10, 3), rng.uniform(-1, 1, 3))
    Ti = math3d.m4inv(T)
    np.testing.assert_allclose(
        np.asarray(Ti) @ np.asarray(T), np.eye(4), atol=1e-12
    )
    pts = rng.uniform(-100, 100, (50, 3))
    out = math3d.transform3(T, pts)
    back = math3d.transform3(Ti, out)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-9)


def test_colmajor_roundtrip():
    rng = np.random.default_rng(2)
    T = rng.normal(size=(4, 4))
    np.testing.assert_array_equal(
        np.asarray(math3d.from_colmajor16(math3d.to_colmajor16(T))), T
    )
