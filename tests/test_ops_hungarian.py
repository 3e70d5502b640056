"""Hungarian matcher tests against scipy's linear_sum_assignment."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from dpft_tpu.ops import hungarian


def _total_cost(cost, rows, cols):
    return float(np.asarray(cost)[np.asarray(rows), np.asarray(cols)].sum())


def test_solve_matches_scipy_square(rng):
    for _ in range(20):
        cost = rng.normal(size=(8, 8)).astype(np.float32)
        got = np.asarray(hungarian.solve(jnp.array(cost)))
        ri, ci = linear_sum_assignment(cost)
        want = cost[ri, ci].sum()
        assert abs(cost[np.arange(8), got].sum() - want) < 1e-4


def test_solve_matches_scipy_rectangular(rng):
    for _ in range(20):
        R, C = 5, 37
        cost = rng.normal(size=(R, C)).astype(np.float32) * 10
        got = np.asarray(hungarian.solve(jnp.array(cost)))
        assert len(set(got.tolist())) == R  # one-to-one
        ri, ci = linear_sum_assignment(cost)
        want = cost[ri, ci].sum()
        assert abs(cost[np.arange(R), got].sum() - want) < 1e-3


def test_assign_detr_contract(rng):
    N, M = 40, 7
    cost = rng.normal(size=(N, M)).astype(np.float32)
    i, j = hungarian.assign(jnp.array(cost))
    i, j = np.asarray(i), np.asarray(j)
    assert np.all(np.diff(i) > 0)  # queries ascending (parity with scipy rows)
    assert sorted(j.tolist()) == list(range(M))
    ri, ci = linear_sum_assignment(cost)
    assert abs(_total_cost(cost, i, j) - cost[ri, ci].sum()) < 1e-4


def test_padded_rows_do_not_change_real_assignment(rng):
    N, M, M_pad = 30, 5, 12
    cost = rng.normal(size=(N, M)).astype(np.float32)
    padded = np.full((N, M_pad), 1e6, np.float32)
    padded[:, :M] = cost
    i, j = hungarian.assign(jnp.array(padded))
    i, j = np.asarray(i), np.asarray(j)
    # restrict to real targets
    keep = j < M
    ri, ci = linear_sum_assignment(cost)
    assert abs(_total_cost(cost, i[keep], j[keep]) - cost[ri, ci].sum()) < 1e-3


def test_assign_vmap(rng):
    B, N, M = 3, 20, 4
    costs = rng.normal(size=(B, N, M)).astype(np.float32)
    i, j = jax.vmap(hungarian.assign)(jnp.array(costs))
    for b in range(B):
        ri, ci = linear_sum_assignment(costs[b])
        got = _total_cost(costs[b], np.asarray(i[b]), np.asarray(j[b]))
        assert abs(got - costs[b][ri, ci].sum()) < 1e-4


def test_assign_scipy_callback(rng):
    N, M = 15, 6
    cost = rng.normal(size=(N, M)).astype(np.float32)
    i, j = hungarian.assign_scipy(jnp.array(cost))
    ri, ci = linear_sum_assignment(cost)
    assert abs(_total_cost(cost, i, j) - cost[ri, ci].sum()) < 1e-5


def test_assign_row_mask_matches_real_subproblem(rng):
    """Virtual-column padding: real targets get exactly the scipy optimum
    of the real subproblem; padded targets return the sentinel index N."""
    N, M_real, M = 30, 5, 12
    for _ in range(10):
        cost_real = rng.normal(size=(N, M_real)).astype(np.float32) * 10
        cost = np.concatenate(
            [cost_real, rng.normal(size=(N, M - M_real)).astype(np.float32)],
            axis=1)
        mask = np.arange(M) < M_real
        i, j = hungarian.assign(jnp.array(cost), jnp.array(mask))
        i, j = np.asarray(i), np.asarray(j)
        assert sorted(j.tolist()) == list(range(M))
        real = j < M_real
        assert np.all(i[real] < N)
        assert np.all(i[~real] == N)  # sentinel for padded targets
        ri, ci = linear_sum_assignment(cost_real)
        got = _total_cost(cost_real, i[real], j[real])
        assert abs(got - cost_real[ri, ci].sum()) < 1e-3
        # one-to-one over real queries
        assert len(set(i[real].tolist())) == M_real


def test_assign_row_mask_all_real_matches_unmasked(rng):
    N, M = 25, 6
    cost = rng.normal(size=(N, M)).astype(np.float32)
    i0, j0 = hungarian.assign(jnp.array(cost))
    i1, j1 = hungarian.assign(jnp.array(cost), jnp.ones(M, bool))
    got0 = _total_cost(cost, np.asarray(i0), np.asarray(j0))
    got1 = _total_cost(cost, np.asarray(i1), np.asarray(j1))
    assert abs(got0 - got1) < 1e-4


def test_assign_row_mask_all_padded(rng):
    N, M = 10, 4
    cost = rng.normal(size=(N, M)).astype(np.float32)
    i, j = hungarian.assign(jnp.array(cost), jnp.zeros(M, bool))
    assert np.all(np.asarray(i) == N)


def test_assign_row_mask_vmap(rng):
    B, N, M = 4, 20, 8
    costs = rng.normal(size=(B, N, M)).astype(np.float32)
    n_real = np.array([1, 3, 8, 0])
    masks = np.arange(M)[None, :] < n_real[:, None]
    i, j = jax.vmap(hungarian.assign)(jnp.array(costs), jnp.array(masks))
    for b in range(B):
        jb, ib = np.asarray(j[b]), np.asarray(i[b])
        real = jb < n_real[b]
        assert np.all(ib[~real] == N)
        if n_real[b]:
            sub = costs[b][:, :n_real[b]]
            ri, ci = linear_sum_assignment(sub)
            got = _total_cost(sub, ib[real], jb[real])
            assert abs(got - sub[ri, ci].sum()) < 1e-3
