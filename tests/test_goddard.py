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


def test_arc_detection_units():
    """detect_control_arcs: saturation classes, blip absorption, oscillatory
    and affine promotion to singular."""
    from lpopc_tpu.core.arcs import (
        Arc, detect_control_arcs, describe_arcs, has_singular_arc,
        promote_interior_if_affine,
    )

    t = np.linspace(0.0, 1.0, 40)
    u = np.concatenate([
        np.full(10, 3.5),                     # upper
        1.5 + 0.5 * (-1.0) ** np.arange(20),  # ringing interior
        np.zeros(10),                          # lower
    ])
    arcs = detect_control_arcs(t, u, 0.0, 3.5)
    assert [a.kind for a in arcs] == ["upper", "singular", "lower"]
    assert arcs[1].oscillations >= 4
    assert has_singular_arc(arcs)
    assert "singular" in describe_arcs(arcs)

    # smooth interior arc: not singular by oscillation...
    u2 = np.concatenate([np.full(10, 3.5), np.linspace(2.0, 1.0, 20), np.zeros(10)])
    arcs2 = detect_control_arcs(t, u2, 0.0, 3.5)
    assert [a.kind for a in arcs2] == ["upper", "interior", "lower"]
    assert not has_singular_arc(arcs2)
    # ...but promoted on a control-affine problem
    promote_interior_if_affine(arcs2, affinity=0.0)
    assert has_singular_arc(arcs2)
    # non-affine: untouched
    arcs3 = detect_control_arcs(t, u2, 0.0, 3.5)
    promote_interior_if_affine(arcs3, affinity=1.0)
    assert not has_singular_arc(arcs3)

    # short blip at a switch is absorbed, not its own arc
    u4 = np.concatenate([np.full(19, 3.5), [1.7], np.zeros(20)])
    arcs4 = detect_control_arcs(t, u4, 0.0, 3.5, min_nodes=2)
    assert [a.kind for a in arcs4] == ["upper", "lower"]

    # a short blip at t0 is absorbed into its SUCCESSOR (the leading-run
    # mirror of the trailing merge): no spurious extra arc/phase at t0
    u5 = np.concatenate([[3.5], np.linspace(2.0, 1.0, 19), np.zeros(20)])
    arcs5 = detect_control_arcs(t, u5, 0.0, 3.5, min_nodes=2)
    assert [a.kind for a in arcs5] == ["interior", "lower"]
    assert arcs5[0].k_start == 0


def test_control_affinity():
    from lpopc_tpu.core.arcs import control_affinity

    sol = solve(goddard.make_problem(degrees=(4,) * 2),
                SolveOptions(mesh_method="none", max_iterations=8))
    ph0 = goddard.make_problem(regularization=0.0).phases[0]
    # Goddard dynamics are affine in T
    assert control_affinity(ph0, sol.phases[0], lagrange=None) < 1e-12
    # the regularized lagrange is quadratic -> non-affine
    ph_reg = goddard.make_problem(regularization=1e-2).phases[0]
    assert control_affinity(ph_reg, sol.phases[0]) > 1e-3


def test_goddard_solve_auto_golden():
    """Automatic singular-arc workflow (detect + eps-continuation) recovers
    the published h* with NO user-chosen phase split."""
    sol = goddard.solve_auto()
    assert sol.solved
    hf = -sol.objective
    assert abs(hf - goddard.PUBLISHED_HF) < 1e-4
    kinds = [a.kind for a in sol.arcs]
    assert kinds == ["upper", "singular", "lower"]


def test_endpoint_dependency_classifier():
    import jax.numpy as jnp
    from lpopc_tpu.core.decompose import _endpoint_dependency

    sample = (jnp.ones(3), jnp.asarray(0.0), jnp.ones(3) * 2.0,
              jnp.asarray(1.0), jnp.zeros(0))
    fin = lambda x0, t0, xf, tf, q: -xf[0] + tf
    assert _endpoint_dependency(fin, 3, 0, sample) == (False, True)
    ini = lambda x0, t0, xf, tf, q: jnp.array([x0[1], t0])
    assert _endpoint_dependency(ini, 3, 0, sample) == (True, False)
    both = lambda x0, t0, xf, tf, q: xf[0] - x0[0]
    assert _endpoint_dependency(both, 3, 0, sample) == (True, True)


def test_decompose_rejects_endpoint_coupled_mayer():
    import dataclasses
    import numpy as np
    import pytest
    from lpopc_tpu.core.decompose import decompose_by_arcs
    from lpopc_tpu.core.arcs import Arc

    p = goddard.make_problem(regularization=0.0)
    ph = dataclasses.replace(
        p.phases[0], mayer=lambda x0, t0, xf, tf, q: xf[0] - x0[0]
    )
    p = dataclasses.replace(p, phases=(ph,))
    # minimal fake solution for the guesses
    sol = solve(goddard.make_problem(degrees=(4,) * 2),
                SolveOptions(mesh_method="none", max_iterations=8))
    arcs = [Arc("upper", 0.0, 0.08, 0, 3, 0), Arc("singular", 0.08, 0.2, 4, 7, 5)]
    with pytest.raises(ValueError, match="both endpoints"):
        decompose_by_arcs(p, sol.phases[0], arcs)


def test_endpoint_dependency_no_cancellation():
    """Opposite-sign dependencies across event components must not cancel
    (Jacobian-based classification, not gradient-of-sum)."""
    import jax.numpy as jnp
    from lpopc_tpu.core.decompose import _endpoint_dependency

    sample = (jnp.ones(3), jnp.asarray(0.0), jnp.ones(3) * 2.0,
              jnp.asarray(1.0), jnp.zeros(0))
    cancel = lambda x0, t0, xf, tf, q: jnp.array([xf[0], -xf[0]])
    assert _endpoint_dependency(cancel, 3, 0, sample) == (False, True)
