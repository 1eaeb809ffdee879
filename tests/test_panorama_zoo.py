"""Projection zoo round-trips + scan_red RANGE/INTERPOLATE reducers
(ref src/slam6d/fbr/projection.cc:552-830, src/slam6d/scan_red.cc:81)."""

import numpy as np
import pytest

from tpu3dtk.ops import panorama as pano


def _room_cloud(n=4000, seed=0):
    """Points on the walls of a box room around the origin (scanner-like)."""
    rng = np.random.default_rng(seed)
    pts = []
    for ax in range(3):
        for sign in (-1.0, 1.0):
            p = rng.uniform(-300, 300, (n // 6, 3))
            p[:, ax] = sign * 300.0
            pts.append(p)
    return np.concatenate(pts)


@pytest.mark.parametrize("method", pano.METHODS)
def test_forward_inverse_consistency(method):
    """inverse(forward(angles)) == angles on the FOV interior."""
    p = pano.PanoramaParams(method=method, min_v_angle=-0.9, max_v_angle=0.9)
    if method in ("rectilinear", "pannini", "stereographic", "azimuthal"):
        p = pano.PanoramaParams(
            method=method,
            min_v_angle=-0.7,
            max_v_angle=0.7,
            min_h_angle=-0.9,
            max_h_angle=0.9,
        )
    fwd, inv = pano._projection_pair(p)
    a = np.linspace(p.min_h_angle + 0.05, p.max_h_angle - 0.05, 40)
    e = np.linspace(p.min_v_angle + 0.05, p.max_v_angle - 0.05, 40)
    A, E = np.meshgrid(a, e)
    A, E = A.ravel(), E.ravel()
    X, Y, ok = fwd(A, E)
    a2, e2 = inv(np.asarray(X)[ok], np.asarray(Y)[ok])
    np.testing.assert_allclose(a2, A[ok], atol=1e-9)
    np.testing.assert_allclose(e2, E[ok], atol=1e-9)


@pytest.mark.parametrize("method", pano.METHODS)
def test_project_recover_roundtrip(method):
    """project → recover reproduces the surviving points to sub-pixel
    ray error."""
    pts = _room_cloud()
    kw = dict(width=360, height=180, method=method)
    if method in ("rectilinear", "pannini", "stereographic", "azimuthal"):
        kw.update(
            min_h_angle=-0.9, max_h_angle=0.9, min_v_angle=-0.7, max_v_angle=0.7
        )
    p = pano.PanoramaParams(**kw)
    pan = pano.project_panorama(pts, p)
    assert (pan.range > 0).sum() > 500
    rec, _ = pano.recover_point_cloud(pan.range, p)
    # each recovered point should be close to the source point that won
    # its pixel (same range, sub-pixel angular offset)
    vi, ui = np.nonzero(pan.range > 0)
    src = pts[pan.index[vi, ui]]
    err = np.linalg.norm(rec - src, axis=1)
    rr = np.linalg.norm(src, axis=1)
    # angular pixel size bound: ~2π/W * r (+ slack for distorted methods)
    assert np.median(err / rr) < 0.03
    assert (err / rr < 0.12).mean() > 0.95


def test_reduce_range_counts():
    pts = _room_cloud()
    p = pano.PanoramaParams(width=400, height=200)
    red, _ = pano.reduce_range(pts, p, scale=0.5)
    assert 100 < len(red) < len(pts)
    # reduced points still lie near the walls (max coord ≈ 300)
    assert np.isclose(np.abs(red).max(), 300.0, atol=15.0)


def test_reduce_interpolate_no_midair_points():
    """Bilinear blending must not invent points between wall and void."""
    pts = _room_cloud()
    p = pano.PanoramaParams(width=400, height=200, max_range=500)
    red, _ = pano.reduce_interpolate(pts, p, scale=0.5)
    assert len(red) > 100
    r = np.linalg.norm(red, axis=1)
    # all ranges within the original range span
    orig = np.linalg.norm(pts, axis=1)
    assert r.max() <= orig.max() + 1.0
    assert r.min() >= orig.min() - 1.0


def test_reflectance_carried_through():
    pts = _room_cloud()
    refl = np.linalg.norm(pts, axis=1).astype(np.float32)  # range as refl
    p = pano.PanoramaParams(width=300, height=150)
    red, rrefl = pano.reduce_range(pts, p, scale=1.0, reflectance=refl)
    assert rrefl is not None and len(rrefl) == len(red)
    # reflectance == range by construction; survives the round trip
    np.testing.assert_allclose(rrefl, np.linalg.norm(red, axis=1), rtol=0.05)
