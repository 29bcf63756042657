"""Golden integration tests: example problems vs analytic solutions.

This is the framework's equivalent of the reference's examples-as-integration-
tests validation story (SURVEY.md §4), upgraded with hard numeric oracles:
brachistochrone (cycloid), Bryson-Denham (J* = 4/(9l)), moon lander
(closed-form bang-bang switch structure).
"""

import numpy as np
import pytest

from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.models import brachistochrone, brysondenham, moonlander


@pytest.fixture(scope="module")
def fast_opts():
    return SolveOptions(mesh_method="none", max_iterations=150)


def test_brachistochrone_matches_cycloid(fast_opts):
    sol = solve(brachistochrone.make_problem(), fast_opts)
    assert sol.solved
    tf_exact = brachistochrone.analytic_tf()
    assert abs(sol.phases[0].tf - tf_exact) < 1e-7
    # final state hits the target
    np.testing.assert_allclose(sol.phases[0].x[-1, :2], [2.0, 2.0], atol=1e-8)
    # speed matches energy conservation v = sqrt(2 g y)
    v = sol.phases[0].x[:, 2]
    y = sol.phases[0].x[:, 1]
    np.testing.assert_allclose(v, np.sqrt(2 * brachistochrone.G * y), atol=1e-6)
    # Hamiltonian of a min-time problem is -1 at every collocation point
    np.testing.assert_allclose(sol.phases[0].hamiltonian, -1.0, atol=1e-5)


def test_brysondenham_objective(fast_opts):
    sol = solve(brysondenham.make_problem(), fast_opts)
    assert sol.solved
    assert abs(sol.objective - 4.0) < 2e-3
    # path bound respected at discretization points
    assert sol.phases[0].x[:, 0].max() <= 1.0 / 9.0 + 1e-8


def test_moonlander_bang_bang(fast_opts):
    tf_exact, ts_exact, fuel_exact = moonlander.analytic_solution()
    sol = solve(moonlander.make_problem(), fast_opts)
    assert sol.solved
    assert abs(sol.objective - fuel_exact) < 1e-3
    assert abs(sol.phases[0].tf - tf_exact) < 1e-3
    # control is (approximately) bang-bang: near 0 early, near U_MAX late
    u = sol.phases[0].u[:, 0]
    t = sol.phases[0].t_col
    assert np.all(u[t < ts_exact - 0.3] < 0.1)
    assert np.all(u[t > ts_exact + 0.3] > moonlander.U_MAX - 0.1)


def test_moonlander_refinement_improves_accuracy():
    tf_exact, ts_exact, fuel_exact = moonlander.analytic_solution()
    coarse = solve(moonlander.make_problem(degrees=(5, 5)),
                   SolveOptions(mesh_method="none"))
    refined = solve(moonlander.make_problem(degrees=(5, 5)),
                    SolveOptions(mesh_method="ph", max_grid_num=4,
                                 desired_relative_error=1e-6))
    assert refined.solved or refined.status == 5
    err_coarse = abs(coarse.objective - fuel_exact)
    err_refined = abs(refined.objective - fuel_exact)
    assert err_refined < err_coarse
    # ph p-refines across the control discontinuity; the sharper h-refinement
    # at the switch point is hp-Liu's smoothness test (tested separately)
    assert err_refined < 5e-3


def test_lowthrust_published_radius(fast_opts):
    from lpopc_tpu.models import lowthrust

    sol = solve(lowthrust.make_problem(), fast_opts)
    assert sol.solved
    rf = -sol.objective
    assert abs(rf - 1.525) < 1e-3  # published optimum ~1.525
    # terminal circular-orbit event satisfied
    xf = sol.phases[0].x[-1]
    assert abs(xf[2] - np.sqrt(1.0 / xf[0])) < 1e-7


def test_launch_published_final_mass():
    from lpopc_tpu.models import launch

    sol = solve(launch.make_problem(), SolveOptions(mesh_method="none",
                                                    max_iterations=400))
    assert sol.solved
    mass = launch.final_mass_kg(sol)
    assert abs(mass - 7529.71) < 1.0  # GPOPS-literature optimum ~7529.7 kg
    tf = sol.phases[3].tf * launch.TU
    assert 900.0 < tf < 950.0
    # linkage mass drops satisfied: m jumps down by the jettisoned dry mass
    for i, link in enumerate(sol.phases[:-1]):
        assert sol.phases[i + 1].x[0, 6] < sol.phases[i].x[-1, 6] + 1e-9


def test_vanderpol_published_cost(fast_opts):
    from lpopc_tpu.models import vanderpol

    free = solve(vanderpol.make_problem(bounded=False), fast_opts)
    assert free.solved
    assert abs(free.objective - 2.867) < 5e-3  # published ~2.87
    bounded = solve(vanderpol.make_problem(bounded=True), fast_opts)
    assert bounded.solved
    # the state bound activates exactly and raises the cost
    assert bounded.objective > free.objective
    np.testing.assert_allclose(bounded.phases[0].x[:, 1].min(), -0.3, atol=1e-6)


def test_costate_sign_convention(fast_opts):
    # min ∫ u^2/2, dx = u, x(0)=0, x(1)=1: u* = 1, costate = -u* = -1
    # (H = u²/2 + λu minimized over u ⇒ λ = -u)
    import jax.numpy as jnp

    from lpopc_tpu.core.problem import Phase, Problem

    ph = Phase(
        nx=1, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([u[0]]),
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
        x0_bounds=(0.0, 0.0), xf_bounds=(1.0, 1.0), x_bounds=(-5.0, 5.0),
        u_bounds=(-5.0, 5.0), t0_bounds=(0.0, 0.0), tf_bounds=(1.0, 1.0),
        mesh_degrees=(5,), mesh_fractions=(-1.0, 1.0),
    )
    sol = solve(Problem(phases=(ph,)), fast_opts)
    assert sol.solved
    np.testing.assert_allclose(sol.phases[0].u[:, 0], 1.0, atol=1e-7)
    np.testing.assert_allclose(sol.phases[0].costate[:, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(sol.phases[0].costate_f[0], -1.0, atol=1e-6)
