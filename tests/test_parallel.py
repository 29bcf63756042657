"""Batched / sharded instance sweeps and the MPC driver."""

import jax
import jax.numpy as jnp
import numpy as np

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.problem import Phase, Problem
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import brachistochrone
from lpopc_tpu.parallel.batch import default_mesh, instance_grid_mesh, make_batch_solver
from lpopc_tpu.parallel.mpc import MPCController


def _double_integrator(tf=1.0):
    return Problem(phases=(Phase(
        nx=2, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0]]),
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
        x0_bounds=(np.array([1.0, 0.0]), np.array([1.0, 0.0])),
        xf_bounds=(np.zeros(2), np.zeros(2)),
        x_bounds=(np.full(2, -10.0), np.full(2, 10.0)),
        u_bounds=(-50.0, 50.0),
        t0_bounds=(0.0, 0.0), tf_bounds=(tf, tf),
        mesh_degrees=(5,), mesh_fractions=(-1.0, 1.0),
    ),), name="double-integrator")


def test_batched_perturbed_instances():
    opts = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60))
    bs = make_batch_solver(brachistochrone.make_problem(degrees=(5, 5)), opts)
    B = 8
    z0, zl, zu, cl, cu = bs.nominal_inputs(B)
    # vary the target x coordinate across instances (pinned xf rows)
    pl = bs.nlp.layout.phases[0]
    row = pl.var_offset + (pl.npts - 1) * pl.nx  # xf of state 0
    shifts = np.linspace(-0.3, 0.3, B) * bs.scaled.var_scale[row]
    zl[:, row] += shifts
    zu[:, row] += shifts
    res = bs.run(*(jnp.asarray(a) for a in (z0, zl, zu, cl, cu)))
    status = np.asarray(res.status)
    assert np.all(status == SOLVED)
    # minimum time increases with distance: objectives ordered along shift
    objs = np.asarray(res.objective) / bs.scaled.obj_scale
    assert np.all(np.diff(objs) > 0)


def test_sharded_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    opts = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=40))
    prob = brachistochrone.make_problem(degrees=(4, 4))
    bs_plain = make_batch_solver(prob, opts)
    bs_dp = make_batch_solver(prob, opts, mesh=default_mesh())
    bs_2d = make_batch_solver(prob, opts, mesh=instance_grid_mesh(2, 4))
    B = 16
    args = tuple(jnp.asarray(a) for a in bs_plain.nominal_inputs(B))
    r0 = bs_plain.run(*args)
    r1 = bs_dp.run(*args)
    r2 = bs_2d.run(*args)
    # Different partitionings reorder floating-point reductions, so iterates
    # (and line-search decisions) differ in ulps; the converged optima agree.
    assert np.all(np.asarray(r0.status) == SOLVED)
    assert np.all(np.asarray(r1.status) == SOLVED)
    assert np.all(np.asarray(r2.status) == SOLVED)
    np.testing.assert_allclose(
        np.asarray(r0.objective), np.asarray(r1.objective), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(r0.objective), np.asarray(r2.objective), atol=1e-7
    )


def test_mpc_closed_loop_regulates_to_origin():
    ctrl = MPCController(_double_integrator(tf=1.0), SolveOptions(tol=1e-8))
    x = np.array([1.0, 0.0])
    dt = 0.05
    for _ in range(40):
        u0, info = ctrl.step(x)
        assert info["status"][0] == SOLVED
        # plant: double integrator forward-euler
        x = x + dt * np.array([x[1], float(u0[0])])
    # the horizon recedes, so regulation is asymptotic; after 2s the plant
    # must be well on its way to the origin
    assert np.linalg.norm(x) < 0.4
    assert ctrl.percentile_ms(50) > 0


def test_mpc_batch_of_plants():
    ctrl = MPCController(_double_integrator(tf=1.0), SolveOptions(tol=1e-8), batch=4)
    X = np.array([[1.0, 0.0], [0.8, 0.1], [1.2, -0.1], [0.5, 0.5]])
    u0, info = ctrl.step(X)
    assert u0.shape == (4, 1)
    assert np.all(info["status"] == SOLVED)
    # more displaced plants brake harder: |u| ordering sanity
    assert abs(u0[3, 0]) != abs(u0[0, 0])
