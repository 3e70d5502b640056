"""Native C++ LAP solver tests (builds native/lap.cc with g++)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

lap_native = pytest.importorskip("dpft_tpu.ops.lap_native")


@pytest.fixture(scope="module")
def lib():
    try:
        return lap_native.load_library()
    except Exception as exc:  # pragma: no cover - toolchain missing
        pytest.skip(f"native build unavailable: {exc}")


def test_native_matches_scipy(lib, rng):
    for _ in range(25):
        R = int(rng.integers(1, 12))
        C = int(rng.integers(R, 40))
        cost = rng.normal(size=(R, C)) * 10
        got = lap_native.solve(cost)
        ri, ci = linear_sum_assignment(cost)
        assert len(set(got.tolist())) == R
        assert abs(cost[np.arange(R), got].sum() - cost[ri, ci].sum()) < 1e-9


def test_native_batch(lib, rng):
    costs = rng.normal(size=(5, 6, 20))
    got = lap_native.solve_batch(costs)
    for b in range(5):
        ri, ci = linear_sum_assignment(costs[b])
        assert abs(costs[b][np.arange(6), got[b]].sum()
                   - costs[b][ri, ci].sum()) < 1e-9


def test_native_rejects_invalid(lib):
    with pytest.raises(ValueError):
        lap_native.solve(np.zeros((5, 3)))  # R > C
