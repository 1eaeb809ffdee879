"""Pallas cell-list NN kernel tests (interpret mode on CPU; the same
code path compiles via Mosaic on TPU)."""

import numpy as np
import pytest

from tpu3dtk.ops import nn_pallas


def _np_nn(q, m):
    d2 = ((q[:, None, :] - m[None]) ** 2).sum(-1)
    idx = d2.argmin(1)
    return idx, d2[np.arange(len(q)), idx]


def test_cell_list_matches_numpy(rng):
    M = 3000
    m = rng.uniform(0, 800, (M, 3)).astype(np.float32)
    q = (m + rng.normal(0, 5, (M, 3))).astype(np.float32)
    mask = np.ones(M, bool)
    idx, d2, found = nn_pallas.nn_cell_list(m, mask, q, mask, 625.0)
    ridx, rd2 = _np_nn(q, m)
    rfound = rd2 < 625.0
    np.testing.assert_array_equal(np.asarray(found), rfound)
    b = rfound
    agree = (np.asarray(idx)[b] == ridx[b]).mean()
    assert agree > 0.999  # ties may differ
    np.testing.assert_allclose(np.asarray(d2)[b], rd2[b], rtol=1e-4, atol=1e-2)


def test_cell_list_masked_and_sparse(rng):
    M = 1000
    m = rng.uniform(0, 2000, (M, 3)).astype(np.float32)
    q = rng.uniform(0, 2000, (300, 3)).astype(np.float32)
    mmask = rng.uniform(size=M) > 0.3
    qmask = np.ones(300, bool)
    idx, d2, found = nn_pallas.nn_cell_list(m, mmask, q, qmask, 2500.0)
    mv = m.copy()
    mv[~mmask] = 1e9
    ridx, rd2 = _np_nn(q, mv)
    rfound = rd2 < 2500.0
    np.testing.assert_array_equal(np.asarray(found), rfound)
    b = rfound
    np.testing.assert_array_equal(np.asarray(idx)[b], ridx[b])


def test_cell_list_boundary_exclusion():
    m = np.asarray([[10.0, 0.0, 0.0]], np.float32)
    q = np.asarray([[0.0, 0.0, 0.0]], np.float32)
    one = np.ones(1, bool)
    _, _, found = nn_pallas.nn_cell_list(m, one, q, one, 100.0)
    assert not bool(found[0])
    _, _, found = nn_pallas.nn_cell_list(m, one, q, one, 100.01)
    assert bool(found[0])
