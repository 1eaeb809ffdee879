"""Block pose-graph solver vs dense f64 Cholesky (the CXSparse role,
ref src/slam6d/graphSlam6D.cc:345-366)."""

import numpy as np

from tpu3dtk.models import graphslam as gs
from tpu3dtk.models import pgsolve


def _random_system(rng, n_scans=40, extra_links=25):
    """SPD LUM-shaped system: chain + random loop links, C = J Jᵀ + εI."""
    links = [(i, i + 1) for i in range(n_scans - 1)]
    for _ in range(extra_links):
        a, b = sorted(rng.choice(n_scans, 2, replace=False))
        links.append((int(a), int(b)))
    links = np.asarray(links, np.int32)
    L = len(links)
    J = rng.normal(size=(L, 6, 8))
    C = J @ J.transpose(0, 2, 1) + 0.5 * np.eye(6)[None]
    CD = rng.normal(size=(L, 6))
    return links, C, CD


def test_block_matvec_matches_dense(rng):
    links, C, CD = _random_system(rng)
    n_scans = int(links.max()) + 1
    G, B = gs.assemble_GB(links, C, CD, n_scans)
    n = n_scans - 1
    x = rng.normal(size=(n, 6))
    y_blk = pgsolve.block_matvec(links, C, x)
    y_dense = (G @ x.reshape(-1)).reshape(n, 6)
    np.testing.assert_allclose(y_blk, y_dense, rtol=1e-10, atol=1e-10)


def test_cg_matches_dense_1e8(rng):
    links, C, CD = _random_system(rng, n_scans=80, extra_links=60)
    n_scans = int(links.max()) + 1
    n = n_scans - 1
    G, B = gs.assemble_GB(links, C, CD, n_scans)
    x_dense = np.linalg.solve(G, B).reshape(n, 6)
    x_cg = pgsolve.solve_block_cg(links, C, B.reshape(n, 6), n)
    assert np.abs(x_cg - x_dense).max() < 1e-8 * max(1.0, np.abs(x_dense).max())


def test_cg_jax_close_to_dense(rng):
    import jax.numpy as jnp

    links, C, CD = _random_system(rng, n_scans=30, extra_links=15)
    n_scans = int(links.max()) + 1
    n = n_scans - 1
    G, B = gs.assemble_GB(links, C, CD, n_scans)
    x_dense = np.linalg.solve(G, B).reshape(n, 6)
    x_jax = np.asarray(
        pgsolve.solve_block_cg_jax(
            jnp.asarray(links), jnp.asarray(C, jnp.float32),
            jnp.asarray(B.reshape(n, 6), jnp.float32), n,
        )
    )
    scale = max(1.0, np.abs(x_dense).max())
    assert np.abs(x_jax - x_dense).max() < 2e-3 * scale  # f32 device path


def test_do_graph_slam_cg_path_matches_dense(rng):
    """Full LUM driver through the CG branch equals the dense branch."""
    import jax.numpy as jnp  # noqa: F401

    from tests.conftest import make_room_cloud
    from tpu3dtk.core import math3d
    from tpu3dtk.core.scan import TPUScan

    cloud = make_room_cloud(rng, n=1800, size=800.0)
    scans = []
    S = 6
    for i in range(S):
        theta = rng.normal(0, 0.01, 3)
        pos = np.array([i * 8.0, 0, 0]) + rng.normal(0, 2.0, 3)
        T = np.asarray(math3d.euler_to_matrix4(pos, theta))
        Ti = np.asarray(math3d.m4inv(T))
        local = (Ti[:3, :3] @ cloud.T).T + Ti[:3, 3]
        s = TPUScan.from_points(local.astype(np.float32), f"{i:03d}", np.eye(4))
        scans.append(s)
    links = gs.build_proximity_graph(
        np.stack([s.rPos for s in scans]), 1e9, 2
    )

    import copy

    def run(dense_max):
        ss = [
            TPUScan.from_points(
                s.reduced_local().copy(), s.identifier, s.transMatOrg.copy()
            )
            for s in scans
        ]
        gs.do_graph_slam(
            ss, links,
            gs.LumParams(
                max_dist_match2=2500.0, iterations=4, epsilon=1e-9,
                dense_solver_max_scans=dense_max,
            ),
        )
        return np.stack([s.transMat for s in ss])

    dense = run(dense_max=100)  # dense branch
    cg = run(dense_max=1)  # CG branch
    np.testing.assert_allclose(dense, cg, atol=5e-5)
