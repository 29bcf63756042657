"""Shuttle-reentry goldens (Betts 2010 ch. 6.1, published optima).

The maximum-crossrange entry is the classic hard benchmark beyond the
reference's shipped examples; the published solution is crossrange
theta(tf) = 34.1412 deg at tf = 2008.6 s, dropping to 30.63 deg under the
70 BTU/ft^2/s leading-edge heating-rate path constraint.
"""

import numpy as np
import pytest

from lpopc_tpu.core.ipm import IPMOptions
from lpopc_tpu.core.solve import SOLVED, SolveOptions
from lpopc_tpu.models import reentry


def test_reentry_crossrange_golden():
    """Fixed 8x6 mesh already nails the published optimum to ~1e-4 deg."""
    sol = reentry.solve(options=SolveOptions(
        mesh_method="none", ipm=IPMOptions(tol=1e-6, max_iter=300)))
    assert sol.status == SOLVED
    assert abs(reentry.crossrange_deg(sol)
               - reentry.PUBLISHED_CROSSRANGE_DEG) < 5e-3
    tf_s = sol.phases[0].tf * reentry.T_S
    assert abs(tf_s - 2008.6) < 1.0


@pytest.mark.slow
def test_reentry_heat_rate_constrained():
    """With the 70 BTU/ft^2/s heating limit the crossrange drops to the
    published 30.63 deg and the constraint rides its bound."""
    sol = reentry.solve(heat_limit=70.0, options=SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=300), max_grid_num=6))
    assert sol.status == SOLVED
    assert sol.max_relative_error < 1e-6
    assert abs(reentry.crossrange_deg(sol)
               - reentry.PUBLISHED_CROSSRANGE_HEAT_DEG) < 0.05
    # the heating rate saturates its limit somewhere along the arc
    ph = sol.phases[0]
    import jax.numpy as jnp

    heat = np.array([
        float(reentry._aero(ph.x[i, 0] * reentry.H_S,
                            ph.x[i, 3] * reentry.V_S,
                            ph.u[min(i, ph.u.shape[0] - 1), 0])[2])
        for i in range(ph.x.shape[0] - 1)
    ])
    assert heat.max() <= 70.0 * 1.01
    assert heat.max() >= 70.0 * 0.98
