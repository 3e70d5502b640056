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
