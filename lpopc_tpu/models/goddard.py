"""Goddard rocket: maximum-altitude ascent (COPS benchmark normalization).

``max h(tf)`` with ``ḣ = v``, ``v̇ = (T - D(h, v))/m - g(h)``, ``ṁ = -T/c``,
thrust ``0 <= T <= 3.5``, fuel limit ``m(tf) >= 0.6``, free final time.
Normalized data (COPS 3.0 "Goddard Rocket"): h0 = m0 = g0 = 1,
``D = Dc v² exp(-hc (h - h0))`` with Dc = 310, hc = 500, ``g = g0 (h0/h)²``,
``c = 0.5 sqrt(g0 h0)``. Published optimum: h* ≈ 1.01283.

The optimal control is bang-singular-bang — the canonical singular-arc stress
test. STATUS: the single-phase formulation converges to the bang-bang local
solution h ≈ 1.0040 (the Newton-type NLP cannot follow the singular arc —
zero reduced curvature along it; hits max_iter crawling at ~1% below the
published optimum). The 3-phase decomposition with the derived singular
surface ``m g = D (1 + v/c)`` (``make_problem_three_phase``) has the right
arc structure but its invariant-surface path equality is rank-deficient
against the defects and currently stalls at large KKT error — kept as the
round-2 work item (reference-class tools solve exactly this formulation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.lgr import uniform_fractions
from ..core.problem import INF, Phase, Problem
from ..core.solve import SolveOptions, solve as _solve

H0, M0, G0 = 1.0, 1.0, 1.0
T_MAX = 3.5
M_FINAL = 0.6
DC = 310.0
HC = 500.0
C_EX = 0.5 * np.sqrt(G0 * H0)
PUBLISHED_HF = 1.01283


def make_problem(degrees=(8,) * 6, fractions=None, regularization: float = 1e-6) -> Problem:
    """``regularization`` adds ``eps ∫ T² dt`` to the cost — the standard
    singular-arc regularization (the unregularized bang-singular-bang problem
    has a singular reduced Hessian along the arc, which stalls Newton-type
    NLP methods; eps = 1e-6 shifts h* by O(eps)). Set 0 for the raw problem.
    """
    if fractions is None:
        fractions = uniform_fractions(len(degrees))

    def dynamics(x, u, t, q):
        h, v, m = x
        T = u[0]
        drag = DC * v * v * jnp.exp(-HC * (h - H0))
        g = G0 * (H0 / h) ** 2
        return jnp.array([v, (T - drag) / m - g, -T / C_EX])

    phase = Phase(
        nx=3, nu=1,
        dynamics=dynamics,
        mayer=lambda x0, t0, xf, tf, q: -xf[0],
        lagrange=(
            (lambda x, u, t, q: regularization * u[0] ** 2)
            if regularization else None
        ),
        x0_bounds=(np.array([H0, 0.0, M0]), np.array([H0, 0.0, M0])),
        xf_bounds=(np.array([H0, 0.0, M_FINAL]), np.array([2.0, 0.5, M_FINAL])),
        x_bounds=(np.array([H0, -0.5, M_FINAL]), np.array([2.0, 0.5, M0])),
        u_bounds=(0.0, T_MAX),
        t0_bounds=(0.0, 0.0),
        tf_bounds=(0.05, 0.4),
        guess_t=np.array([0.0, 0.1, 0.2]),
        guess_x=np.array([[1.0, 0.0, 1.0], [1.005, 0.1, 0.8], [1.01, 0.0, 0.6]]),
        guess_u=np.array([[T_MAX], [1.0], [0.0]]),
        mesh_degrees=tuple(degrees),
        mesh_fractions=tuple(fractions),
        name="goddard",
    )
    return Problem(phases=(phase,), name="goddard")


def make_problem_three_phase(degrees=((6, 6), (8, 8), (6, 6))) -> Problem:
    """Bang–singular–bang decomposition (the methodology GPOPS-class tools use
    for this problem): phase 1 full thrust, phase 2 free thrust ON the
    singular surface ``m g - (1 + v/c) D = 0`` imposed as an equality path
    constraint, phase 3 zero thrust (coast) to the apex. Free interior times
    via the automatic time linkage. Recovers the published h* ≈ 1.0128 that
    the single-phase bang-bang local optimum (h ≈ 1.0040) misses.
    """
    from ..core.problem import Linkage

    def dynamics(x, u, t, q):
        h, v, m = x
        T = u[0]
        drag = DC * v * v * jnp.exp(-HC * (h - H0))
        g = G0 * (H0 / h) ** 2
        return jnp.array([v, (T - drag) / m - g, -T / C_EX])

    def singular_surface(x, u, t, q):
        h, v, m = x
        drag = DC * v * v * jnp.exp(-HC * (h - H0))
        g = G0 * (H0 / h) ** 2
        return jnp.array([m * g - (1.0 + v / C_EX) * drag])

    x_lo = np.array([H0, -0.5, M_FINAL])
    x_hi = np.array([2.0, 0.5, M0])
    common = dict(
        nx=3, nu=1, dynamics=dynamics,
        x_bounds=(x_lo, x_hi),
    )
    guess_h = [(1.0, 1.004), (1.004, 1.009), (1.009, 1.0128)]
    guess_v = [(0.0, 0.14), (0.14, 0.05), (0.05, 0.0)]
    guess_m = [(1.0, 0.75), (0.75, 0.6), (0.6, 0.6)]
    guess_T = [(T_MAX, T_MAX), (1.5, 0.5), (0.0, 0.0)]
    t_knots = [0.0, 0.023, 0.068, 0.2]
    phases = []
    for i in range(3):
        u_b = {0: (T_MAX, T_MAX), 1: (0.0, T_MAX), 2: (0.0, 0.0)}[i]
        t0b = (0.0, 0.0) if i == 0 else (0.01, 0.3)
        tfb = (0.01, 0.3) if i < 2 else (0.05, 0.4)
        kw = dict(common)
        if i == 1:
            kw.update(npath=1, path=singular_surface, path_bounds=(0.0, 0.0))
        if i == 0:
            kw.update(x0_bounds=(np.array([H0, 0.0, M0]), np.array([H0, 0.0, M0])))
        if i == 2:
            kw.update(xf_bounds=(np.array([H0, 0.0, M_FINAL]),
                                 np.array([2.0, 0.0, M_FINAL])),
                      mayer=lambda x0, t0, xf, tf, q: -xf[0])
        phases.append(Phase(
            u_bounds=u_b, t0_bounds=t0b, tf_bounds=tfb,
            guess_t=np.array([t_knots[i], t_knots[i + 1]]),
            guess_x=np.array([[guess_h[i][0], guess_v[i][0], guess_m[i][0]],
                              [guess_h[i][1], guess_v[i][1], guess_m[i][1]]]),
            guess_u=np.array([[guess_T[i][0]], [guess_T[i][1]]]),
            mesh_degrees=tuple(degrees[i]),
            mesh_fractions=uniform_fractions(len(degrees[i])),
            name=f"goddard-phase-{i + 1}",
            **kw,
        ))
    links = tuple(
        Linkage(left=i, right=i + 1, nlink=3,
                fn=lambda xfl, ql, x0r, qr: x0r - xfl)
        for i in range(2)
    )
    return Problem(phases=tuple(phases), linkages=links, name="goddard-3phase")


def solve(options: SolveOptions = None, **kw):
    return _solve(make_problem(**kw), options or SolveOptions(mesh_method="hp-liu"))
