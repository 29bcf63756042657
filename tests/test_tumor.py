"""Tumor anti-angiogenesis: the second singular-arc benchmark, solved by the
SAME automatic detect + continuation workflow as Goddard (nothing
problem-specific: no hand-derived singular surface, no user phase split)."""

import numpy as np

from lpopc_tpu.models import tumor


def test_tumor_solve_auto_singular_structure_and_value():
    sol = tumor.solve_auto()
    assert sol.solved
    # detected therapy structure: full dose, then ride the singular arc
    kinds = [a.kind for a in sol.arcs]
    assert kinds[0] == "upper"
    assert "singular" in kinds
    sing = next(a for a in sol.arcs if a.kind == "singular")
    horizon = sol.phases[0].tf - sol.phases[0].t0
    assert (sing.t_end - sing.t_start) > 0.5 * horizon
    # continuation limit, self-consistency pin: (6,)*6 mesh gives 1954.51,
    # (8,)*12 with eps down to 1e-6 gives 1954.39 (0.006% apart)
    p_tf = sol.objective * tumor.SCALE
    assert abs(p_tf - 1954.4) < 2.0
    # dose budget nearly exhausted, never exceeded
    y_f = sol.phases[0].x[-1, 2]
    assert 0.9 < y_f <= 1.0 + 1e-9
    u = sol.phases[0].u[:, 0]
    assert u.min() > -1e-9 and u.max() < 1.0 + 1e-9


def test_tumor_regularized_rung_solves():
    """Rung-0 solve alone (cheap): regular problem, full convergence."""
    sol = tumor._solve(
        tumor.make_problem_regularized(1e-2), tumor.auto_options()
    )
    assert sol.solved
    assert sol.kkt_error < 1e-7


def test_tumor_decomposed_beats_continuation():
    """The automatic per-arc decomposition (free switch time, eps confined
    to the singular phase) reaches a slightly LOWER p(tf) than the eps
    ladder — regularization bias removed from the bang arc."""
    sol = tumor.solve_auto(method="decompose")
    assert sol.solved
    p_tf = sol.objective * tumor.SCALE
    assert abs(p_tf - 1951.8) < 3.0
    assert p_tf < 1954.6  # at least as good as the continuation limit
