"""Feasibility-restoration phase + two-stage mixed-precision cascade tests.

The reference inherits IPOPT's restoration phase through ``OptimizeTNLP``
(``/root/reference/Lpopc/src/Core/LpNLPSolver.cpp:45``); ours is a
Gauss-Newton minimize-||c||_D mode reusing the condensed-KKT factorization
(``core/ipm.py``, the ``in_resto`` branches).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpopc_tpu.core.ipm import IPMOptions, SOLVED, build_solver

INF = 1e20


def _solve(obj, con, n, m, x0, lo, hi, cl, cu, **kw):
    kw.setdefault("max_iter", 120)
    opts = IPMOptions(tol=1e-8, **kw)
    solver = jax.jit(build_solver(obj, con, n, m, opts))
    return solver(
        jnp.array(x0), jnp.array(lo), jnp.array(hi), jnp.array(cl), jnp.array(cu)
    )


def test_restoration_no_regression_on_benign_problems():
    """Restoration must not change the outcome on problems the filter method
    already solves (it only engages on deadlock)."""
    cases = [
        (lambda z: (z[0] - 1.0) ** 2 + (z[1] - 1.0) ** 2,
         lambda z: jnp.array([z[0] ** 2 + z[1] ** 2 - 25.0]),
         2, 1, [40.0, -40.0], [-INF, -INF], [INF, INF], [0.0], [0.0]),
        (lambda z: (z[0] - 1.0) ** 2,
         lambda z: jnp.array([z[0] + z[1] - 10.0]),
         2, 1, [0.01, 0.01], [0.0, 0.0], [6.0, 6.0], [0.0], [0.0]),
    ]
    for obj, con, n, m, x0, lo, hi, cl, cu in cases:
        r_off = _solve(obj, con, n, m, x0, lo, hi, cl, cu, restoration=False)
        r_on = _solve(obj, con, n, m, x0, lo, hi, cl, cu, restoration=True)
        assert int(r_off.status) == SOLVED
        assert int(r_on.status) == SOLVED
        np.testing.assert_allclose(
            np.asarray(r_on.z), np.asarray(r_off.z), atol=1e-6
        )


def test_infeasible_problem_settles_at_minimal_violation():
    """x1 + x2 = 10 with x in [0,4]^2 is infeasible; the solver must settle at
    the minimal-violation point (4,4) instead of diverging, and report a
    non-SOLVED status (the reference would raise LPOPC_NLPSOLVER_ERROR,
    LpNLPSolver.cpp:50-53; we return per-instance status)."""
    res = _solve(
        lambda z: (z[0] - 1.0) ** 2 + z[1],
        lambda z: jnp.array([z[0] + z[1] - 10.0]),
        2, 1, [0.5, 0.5], [0.0, 0.0], [4.0, 4.0], [0.0], [0.0],
        restoration=True, max_iter=80,
    )
    assert int(res.status) != SOLVED
    np.testing.assert_allclose(np.asarray(res.z), [4.0, 4.0], atol=1e-3)


def test_restoration_mode_reduces_infeasibility_on_deadlock():
    """Waechter-Biegler counterexample (min x1, x1^2 - x2 = 1,
    x1 - x3 = 0.5, x2, x3 >= 0, from (-2, 3, 1)): line-search Newton IP
    methods provably converge to an infeasible point from this start, and
    theta has an infeasible local minimizer at x1 = -1 blocking feasibility
    descent. Round-1's soft re-centering burned the WHOLE iteration budget
    frozen at x1 = -0.984; with restoration the deadlock must now terminate
    EARLY with the explicit IPOPT-style "restoration failed" verdict
    (two unproductive episodes -> FAILED) instead of spinning."""
    obj = lambda z: z[0]
    con = lambda z: jnp.array([z[0] ** 2 - z[1] - 1.0, z[0] - z[2] - 0.5])
    res = _solve(
        obj, con, 3, 2, [-2.0, 3.0, 1.0],
        [-INF, 0.0, 0.0], [INF, INF, INF], [0.0, 0.0], [0.0, 0.0],
        restoration=True,
    )
    z = np.asarray(res.z)
    assert np.all(np.isfinite(z))
    from lpopc_tpu.core.ipm import FAILED

    assert int(res.status) == FAILED
    assert int(res.iterations) < 120  # early termination, not budget burn
    # from the good basin the same problem solves exactly
    res2 = _solve(
        obj, con, 3, 2, [0.0, 1.0, 0.1],
        [-INF, 0.0, 0.0], [INF, INF, INF], [0.0, 0.0], [0.0, 0.0],
        restoration=True,
    )
    assert int(res2.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res2.z), [1.0, 0.0, 0.5], atol=1e-6)
