"""Goddard rocket: single-phase bang-bang local solution + the 3-phase
bang-singular-bang decomposition hitting the published optimum."""

import numpy as np

from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.models import goddard


def test_goddard_reaches_bang_bang_solution():
    sol = solve(goddard.make_problem(degrees=(6,) * 4),
                SolveOptions(mesh_method="none", max_iterations=150))
    hf = -sol.objective
    # the bang-bang local solution; the singular arc (unresolved) would add ~1%
    assert 1.0035 < hf < goddard.PUBLISHED_HF + 5e-3
    # fuel budget exactly spent, thrust respects bounds
    assert abs(sol.phases[0].x[-1, 2] - goddard.M_FINAL) < 1e-8
    u = sol.phases[0].u[:, 0]
    assert u.min() > -1e-9 and u.max() < goddard.T_MAX + 1e-9


def test_goddard_three_phase_singular_arc_golden():
    """The 3-phase singular-arc decomposition recovers the COPS published
    h* = 1.01283 (the benchmark where round 1 was beaten by reference-class
    tools; see make_problem_three_phase docstring for the three fixes)."""
    sol = goddard.solve_three_phase()
    assert sol.solved
    hf = -sol.objective
    assert abs(hf - goddard.PUBLISHED_HF) < 1e-4
    assert sol.kkt_error < 1e-7
    # switch structure: t_switch1 < t_switch2 < t_apex, fuel exactly spent
    t1 = sol.phases[0].tf
    t2 = sol.phases[1].tf
    t3 = sol.phases[2].tf
    assert 0.0 < t1 < t2 < t3
    assert abs(sol.phases[1].x[-1, 2] - goddard.M_FINAL) < 1e-8
    # velocity zero at apex
    assert abs(sol.phases[2].x[-1, 1]) < 1e-8
