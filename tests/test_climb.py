"""Minimum-time climb with tabulated aero data (models/climb.py).

Pins the table machinery end-to-end inside the IPM: the spline-deck solve
must agree with the closed-form solve to interpolation accuracy.
"""

import numpy as np
import pytest

from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.models import climb


@pytest.fixture(scope="module")
def sols():
    opts = SolveOptions(mesh_method="none")
    sa = solve(climb.make_problem(tabulated=False), opts)
    st = solve(climb.make_problem(tabulated=True), opts)
    return sa, st


def test_analytic_golden(sols):
    sa, _ = sols
    assert sa.solved
    assert sa.kkt_error < 1e-7
    # self-consistent golden (two independent formulations agree; climbs in
    # the energy-method band for this thrust/weight)
    assert abs(sa.objective - 67.7506) < 5e-3
    # boundary conditions hit exactly
    ph = sa.phases[0]
    assert abs(ph.x[0, 0] - climb.H0) < 1e-6
    assert abs(ph.x[-1, 0] - climb.HF) < 1e-6
    assert abs(ph.x[-1, 1] - climb.VF) < 1e-6


def test_tabulated_matches_analytic(sols):
    """The spline-deck dynamics reproduce the closed-form optimum to
    interpolation accuracy — values, gradients AND Hessians of the tables
    all flow through the Newton IPM."""
    sa, st = sols
    assert st.solved
    assert st.kkt_error < 1e-7
    assert abs(st.objective - sa.objective) / sa.objective < 1e-4
    # trajectories agree pointwise (same mesh -> same collocation times)
    xa, xt = sa.phases[0].x, st.phases[0].x
    assert np.max(np.abs(xa[:, 0] - xt[:, 0])) < 5.0          # h within 5 m
    assert np.max(np.abs(xa[:, 1] - xt[:, 1])) < 0.5          # v within 0.5 m/s
    # the control stays inside the deck's tabulated envelope
    assert st.phases[0].x[:, 1].max() / climb.A0 < 1.4
    assert st.phases[0].x[:, 0].max() <= climb.H_MAX + 1e-6


def test_table_resolution_convergence():
    """A coarser deck shifts the optimum by more; refining the deck
    converges toward the closed-form answer (sanity that the agreement in
    test_tabulated_matches_analytic is not coincidental)."""
    opts = SolveOptions(mesh_method="none")
    coarse = solve(climb.make_problem(tabulated=True, n_h=7, n_m=5), opts)
    assert coarse.solved
    err_coarse = abs(coarse.objective - 67.7506)
    assert err_coarse < 0.5  # still the same problem...
    assert err_coarse > 1e-5  # ...but visibly less accurate than the fine deck
