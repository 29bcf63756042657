"""Round-3 feature tests: adaptive per-grid NLP tolerance, parallel line
search equivalence, MPC warm-dual iteration savings."""

import numpy as np

import jax.numpy as jnp

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.problem import Phase, Problem
from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.models import brachistochrone, moonlander


def test_grid_tol_schedule_same_answer_full_final_accuracy():
    """Adaptive per-grid tolerance must not change the converged answer and
    must deliver the FULL tolerance on the returned solution (final-mesh
    polish)."""
    kw = dict(mesh_method="ph", max_grid_num=4, desired_relative_error=1e-6)
    s_off = solve(brachistochrone.make_problem(degrees=(4, 4)),
                  SolveOptions(grid_tol_schedule="off", **kw))
    s_ad = solve(brachistochrone.make_problem(degrees=(4, 4)),
                 SolveOptions(grid_tol_schedule="adaptive", **kw))
    assert s_off.solved and s_ad.solved
    assert abs(s_off.objective - s_ad.objective) < 1e-7
    # the returned solution is at the full tolerance, not the loose grid tol
    assert s_ad.kkt_error <= 1e-7


def test_parallel_ls_matches_sequential():
    p = brachistochrone.make_problem(degrees=(6, 6))
    kw = dict(mesh_method="none")
    s_seq = solve(p, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=60, ls_mode="sequential"), **kw))
    s_par = solve(p, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=60, ls_mode="parallel"), **kw))
    assert s_seq.solved and s_par.solved
    # identical semantics: same alpha choices -> same iterates
    assert abs(s_seq.objective - s_par.objective) < 1e-10
    np.testing.assert_allclose(s_seq.z, s_par.z, atol=1e-9)


def _double_integrator():
    return Problem(phases=(Phase(
        nx=2, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0]]),
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2 + x[0] ** 2,
        x0_bounds=(np.array([1.0, 0.0]), np.array([1.0, 0.0])),
        xf_bounds=(np.zeros(2), np.zeros(2)),
        x_bounds=(np.full(2, -10.0), np.full(2, 10.0)),
        u_bounds=(-50.0, 50.0), t0_bounds=(0.0, 0.0), tf_bounds=(1.0, 1.0),
        mesh_degrees=(8,), mesh_fractions=(-1.0, 1.0),
    ),))


def test_mpc_warm_duals_cut_iterations():
    from lpopc_tpu.parallel.mpc import MPCController

    def run(**kwargs):
        ctrl = MPCController(_double_integrator(), SolveOptions(tol=1e-6),
                             **kwargs)
        x = np.array([1.0, 0.0])
        iters = []
        for _ in range(6):
            u0, info = ctrl.step(x)
            assert int(info["status"][0]) == SOLVED
            iters.append(int(info["iterations"][0]))
            x = x + 0.02 * np.array([x[1], float(u0[0])])
        return iters, x

    it_cold, x_cold = run(warm_bound_duals=False)
    it_warm, x_warm = run()
    it_shift, x_shift = run(shift_dt=0.02)
    # steady-state re-solves with carried duals converge in ~1 iteration
    assert it_warm[-1] < it_cold[-1]
    assert it_warm[-1] <= 2
    assert it_shift[-1] <= 2
    # control quality unchanged (closed-loop trajectories agree)
    np.testing.assert_allclose(x_warm, x_cold, atol=1e-6)
    np.testing.assert_allclose(x_shift, x_cold, atol=1e-4)


def test_mpc_rti_mode_fixed_budget():
    from lpopc_tpu.parallel.mpc import MPCController

    ctrl = MPCController(_double_integrator(), SolveOptions(tol=1e-6),
                         rti_iters=2, shift_dt=0.02)
    x = np.array([1.0, 0.0])
    for _ in range(6):
        u0, info = ctrl.step(x)
        assert int(info["iterations"][0]) <= 2   # hard per-step budget
        x = x + 0.02 * np.array([x[1], float(u0[0])])
    # the RTI controller still regulates the plant toward the origin
    assert abs(x[0]) < 1.0


def test_dual_sensitivities_match_finite_differences():
    """dJ*/dx0 and dJ*/dq from the bound duals (envelope theorem) match
    finite differences of re-solves — design/value-function gradients come
    free with every solve."""
    from lpopc_tpu.parallel.batch import make_batch_solver

    # brachistochrone with pinned x0: shift the start point
    p = brachistochrone.make_problem(degrees=(6, 6))
    bs = make_batch_solver(p, SolveOptions(
        ipm=IPMOptions(tol=1e-10, max_iter=60)))
    h = 1e-5
    nx = bs.nlp.layout.phases[0].nx
    deltas = np.zeros((3, nx))
    deltas[1, 0] = h
    deltas[2, 1] = h
    z0, zl, zu, cl, cu = bs.perturb_x0(3, 0, deltas)
    res = bs.run(*(jnp.asarray(a) for a in (z0, zl, zu, cl, cu)))
    assert np.all(np.asarray(res.status) == SOLVED)
    sens = bs.x0_sensitivities(res)
    obj = np.asarray(res.objective) / bs.scaled.obj_scale
    fd_x = (obj[1] - obj[0]) / h
    fd_y = (obj[2] - obj[0]) / h
    nx = bs.nlp.layout.phases[0].nx
    assert abs(sens[0, 0] - fd_x) < 5e-3 * max(1.0, abs(fd_x))
    assert abs(sens[0, 1] - fd_y) < 5e-3 * max(1.0, abs(fd_y))
    # pinned entries only
    pinned_rows = np.isfinite(sens[0])
    assert pinned_rows[:2].all()


def test_mpc_value_gradient():
    from lpopc_tpu.parallel.mpc import MPCController

    ctrl = MPCController(_double_integrator(), SolveOptions(tol=1e-8))
    u0, info = ctrl.step(np.array([1.0, 0.0]))
    g = ctrl.value_gradient()
    assert g.shape == (1, 2) and np.all(np.isfinite(g))
    # FD check on the first state component
    h = 1e-5
    u0b, infob = MPCController(
        _double_integrator(), SolveOptions(tol=1e-8)
    ).step(np.array([1.0 + h, 0.0]))
    fd = (float(infob["objective"][0]) - float(info["objective"][0])) / h
    assert abs(g[0, 0] - fd) < 5e-3 * max(1.0, abs(fd))
