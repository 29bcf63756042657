"""hp-Liu refinement strategy units + integration behavior."""

import numpy as np
import pytest

from lpopc_tpu.core.refine_liu import LiuState, _merge_ok, liu_refine_phase
from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.models import moonlander


def test_liu_concentrates_mesh_at_switch():
    tf_exact, ts_exact, fuel_exact = moonlander.analytic_solution()
    sol = solve(
        moonlander.make_problem(degrees=(5, 5)),
        SolveOptions(mesh_method="hp-liu", max_grid_num=5,
                     desired_relative_error=1e-6),
    )
    assert sol.solved
    assert sol.max_relative_error <= 1e-6
    # mesh boundaries bracket the bang-bang switch point
    tau_switch = 2.0 * ts_exact / sol.phases[0].tf - 1.0
    fr = np.asarray(sol.phases[0].mesh_fractions)
    assert np.min(np.abs(fr - tau_switch)) < 0.2
    # hp-Liu beats ph on the discontinuity at the same budget
    assert abs(sol.objective - fuel_exact) < 1e-3


def test_liu_reduces_degree_on_converged_smooth_segment():
    # a degree-12 segment whose solution is effectively low-order should be
    # reduced when its error is already far below tolerance
    from lpopc_tpu.core.postprocess import PhaseSolution
    from lpopc_tpu.models.moonlander import make_problem

    ph = make_problem(degrees=(12,)).phases[0]
    t_state = (np.concatenate([
        __import__("lpopc_tpu.ops.lgr", fromlist=["lgr_nodes_weights"]).lgr_nodes_weights(12)[0],
        [1.0],
    ]) + 1.0) / 2.0
    x = np.stack([1.0 - t_state, 0.1 * t_state], axis=1)  # linear: low order
    psol = PhaseSolution(
        t_state=t_state, x=x, t_col=t_state[:-1], u=np.zeros((12, 1)),
        t0=0.0, tf=1.0, q=np.zeros(0), costate=np.zeros((12, 2)),
        costate_f=np.zeros(2), path_multipliers=np.zeros((12, 0)),
        hamiltonian=np.zeros(12), mesh_degrees=(12,), mesh_fractions=(-1.0, 1.0),
    )
    state = LiuState()
    d, f, ok = liu_refine_phase(
        ph, psol, np.array([1e-12]), state, tol=1e-6, n_min=4, n_max=16
    )
    assert ok
    assert d[0] < 12  # degree reduced


def test_liu_divides_on_nonsmooth_history():
    from lpopc_tpu.core.postprocess import PhaseSolution
    from lpopc_tpu.models.moonlander import make_problem

    ph = make_problem(degrees=(8,)).phases[0]

    def make_psol(sharpness):
        t_state = (np.concatenate([
            __import__("lpopc_tpu.ops.lgr", fromlist=["lgr_nodes_weights"]).lgr_nodes_weights(8)[0],
            [1.0],
        ]) + 1.0) / 2.0
        x = np.stack([np.tanh(sharpness * (t_state - 0.5)), t_state], axis=1)
        return PhaseSolution(
            t_state=t_state, x=x, t_col=t_state[:-1], u=np.zeros((8, 1)),
            t0=0.0, tf=1.0, q=np.zeros(0), costate=np.zeros((8, 2)),
            costate_f=np.zeros(2), path_multipliers=np.zeros((8, 0)),
            hamiltonian=np.zeros(8), mesh_degrees=(8,), mesh_fractions=(-1.0, 1.0),
        )

    state = LiuState()
    # first pass: establishes history (smooth-ish)
    liu_refine_phase(ph, make_psol(3.0), np.array([1e-2]), state,
                     tol=1e-6, n_min=4, n_max=16)
    # second pass: curvature grew a lot -> nonsmooth -> divide
    d, f, ok = liu_refine_phase(ph, make_psol(30.0), np.array([1e-2]), state,
                                tol=1e-6, n_min=4, n_max=16)
    assert not ok
    assert len(d) >= 2  # segment was divided


def test_merge_ok_behavior():
    taus = np.linspace(-1, 1, 2001)
    smooth = np.stack([taus**2, np.ones_like(taus)], axis=1)
    assert _merge_ok(taus, smooth, -0.5, 0.5, 6, 1e-6)
    kinked = np.stack([np.abs(taus), np.ones_like(taus)], axis=1)
    assert not _merge_ok(taus, kinked, -0.5, 0.5, 6, 1e-6)
