"""Trajectory / pose format converters — the reference's converter tool
family (src/slam6d/: frames2pose, pose2frames, frames2kitti, kitti2pose,
frames2riegl, riegl2frames, frames2tum, trajectoryLength, toGlobal;
SURVEY §2.1 'converters' row).

All converters operate on the standard (4,4) pose layout and use the
column-major 16-vector only at file boundaries.
"""

from __future__ import annotations

import os

import numpy as np

from ..core import math3d
from . import frames as frames_io
from .scandir import list_identifiers
from .formats import get_format

__all__ = [
    "frames_to_pose",
    "pose_to_frames",
    "matrix_to_kitti",
    "kitti_to_matrix",
    "frames_to_kitti",
    "kitti_to_poses",
    "frames_to_tum",
    "trajectory_length",
    "ate",
]

# kitti frame = sign conjugation D·T·D (D = diag(1,-1,1,1)) + cm -> m
# (ref frames2kitti.cc:116-135)
_D = np.diag([1.0, -1.0, 1.0, 1.0])


def matrix_to_kitti(T: np.ndarray) -> np.ndarray:
    """3DTK pose (4,4), cm -> KITTI 12-vector (row-major [R|t] in m)."""
    K = _D @ np.asarray(T, np.float64) @ _D
    K = K.copy()
    K[:3, 3] /= 100.0
    return K[:3, :4].reshape(12)


def kitti_to_matrix(row: np.ndarray) -> np.ndarray:
    """KITTI 12-vector -> 3DTK pose (4,4) in cm."""
    K = np.eye(4)
    K[:3, :4] = np.asarray(row, np.float64).reshape(3, 4)
    K[:3, 3] *= 100.0
    return _D @ K @ _D


def frames_to_pose(directory: str, out_dir: str | None = None) -> int:
    """Write scanXXX.pose from the final pose of each scanXXX.frames
    (ref frames2pose.cc)."""
    from .writer import write_pose

    out_dir = out_dir or directory
    count = 0
    for fn in sorted(os.listdir(directory)):
        if not fn.endswith(".frames"):
            continue
        ident = fn[: -len(".frames")]
        T = frames_io.final_pose(os.path.join(directory, fn))
        theta, pos = math3d.matrix4_to_euler(T)
        write_pose(os.path.join(out_dir, f"{ident}.pose"), np.asarray(pos), np.asarray(theta))
        count += 1
    return count


def pose_to_frames(directory: str, out_dir: str | None = None) -> int:
    """Write a one-line scanXXX.frames from each scanXXX.pose (ref
    pose2frames.cc)."""
    from .scandir import read_pose_file

    out_dir = out_dir or directory
    count = 0
    for fn in sorted(os.listdir(directory)):
        if not fn.endswith(".pose"):
            continue
        ident = fn[: -len(".pose")]
        pos, theta = read_pose_file(os.path.join(directory, fn))
        T = np.asarray(math3d.euler_to_matrix4(pos, theta))
        frames_io.write_frames(
            os.path.join(out_dir, f"{ident}.frames"),
            T[None],
            [frames_io.AlgoType.ICP],
        )
        count += 1
    return count


def frames_to_kitti(directory: str, out_path: str) -> int:
    """Final poses of all .frames -> one KITTI trajectory file (one
    12-value row per scan, ref frames2kitti.cc)."""
    rows = []
    for fn in sorted(os.listdir(directory)):
        if fn.endswith(".frames"):
            rows.append(matrix_to_kitti(frames_io.final_pose(os.path.join(directory, fn))))
    np.savetxt(out_path, np.asarray(rows), fmt="%.9g")
    return len(rows)


def kitti_to_poses(kitti_path: str, out_dir: str) -> int:
    """KITTI trajectory file -> scanXXX.pose files (ref kitti2pose.cc)."""
    from .writer import write_pose

    os.makedirs(out_dir, exist_ok=True)
    rows = np.loadtxt(kitti_path, ndmin=2)
    for i, row in enumerate(rows):
        T = kitti_to_matrix(row)
        theta, pos = math3d.matrix4_to_euler(T)
        write_pose(
            os.path.join(out_dir, f"scan{i:03d}.pose"), np.asarray(pos), np.asarray(theta)
        )
    return len(rows)


def frames_to_tum(directory: str, out_path: str, dt: float = 1.0) -> int:
    """Final poses -> TUM trajectory (t tx ty tz qx qy qz qw, metres;
    ref frames2tum.cc)."""
    lines = []
    i = 0
    for fn in sorted(os.listdir(directory)):
        if not fn.endswith(".frames"):
            continue
        T = frames_io.final_pose(os.path.join(directory, fn))
        q = np.asarray(math3d.matrix4_to_quat(T))  # [w,x,y,z]
        t = T[:3, 3] / 100.0
        lines.append(
            f"{i * dt:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}"
        )
        i += 1
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return i


def trajectory_length(directory: str) -> float:
    """Sum of distances between consecutive final poses (ref
    trajectoryLength.cc), in cm."""
    poses = []
    for fn in sorted(os.listdir(directory)):
        if fn.endswith(".frames"):
            poses.append(frames_io.final_pose(os.path.join(directory, fn))[:3, 3])
    if len(poses) < 2:
        return 0.0
    p = np.asarray(poses)
    return float(np.linalg.norm(np.diff(p, axis=0), axis=1).sum())


def ate(frames_dir_a: str, frames_dir_b: str, align: bool = True):
    """Absolute trajectory error between two .frames directories — the
    evaluation role of match_with_ground_truth.cc.

    Returns dict with rmse/mean/max position error (cm) after optional
    Horn alignment of trajectory a onto b.
    """
    def load(d):
        out = {}
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".frames"):
                out[fn] = frames_io.final_pose(os.path.join(d, fn))[:3, 3]
        return out

    A = load(frames_dir_a)
    B = load(frames_dir_b)
    common = sorted(set(A) & set(B))
    if not common:
        raise ValueError("no common .frames identifiers")
    pa = np.asarray([A[k] for k in common])
    pb = np.asarray([B[k] for k in common])
    if align and len(common) >= 3:
        ca, cb = pa.mean(0), pb.mean(0)
        H = (pb - cb).T @ (pa - ca)
        U, _, Vt = np.linalg.svd(H)
        D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
        R = U @ D @ Vt
        pa = (pa - ca) @ R.T + cb
    err = np.linalg.norm(pa - pb, axis=1)
    return {
        "rmse": float(np.sqrt((err**2).mean())),
        "mean": float(err.mean()),
        "max": float(err.max()),
        "n": len(common),
    }
