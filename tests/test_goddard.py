"""Goddard rocket smoke test (singular arc: known partial support, see model
docstring)."""

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
