"""Transcription tests: layout, packing, defects on exact solutions, AD."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from lpopc_tpu import Linkage, Phase, Problem, transcribe
from lpopc_tpu.core.transcribe import pack, unpack_phase


def _poly_phase(**kw):
    # dx/dt = 2t  (x = t^2), one state, no control
    return Phase(
        nx=1,
        nu=0,
        dynamics=lambda x, u, t, q: jnp.array([2.0 * t]),
        x0_bounds=(0.0, 0.0),
        xf_bounds=(4.0, 4.0),
        x_bounds=(-10.0, 10.0),
        t0_bounds=(0.0, 0.0),
        tf_bounds=(2.0, 2.0),
        mesh_degrees=(4, 4),
        mesh_fractions=(-1.0, 0.0, 1.0),
        **kw,
    )


def test_defects_vanish_on_exact_polynomial_solution():
    prob = Problem(phases=[_poly_phase()])
    nlp = transcribe(prob)
    op = nlp.ops[0]
    t_state = (np.asarray(op.tau_state) + 1.0) * 1.0 + 0.0  # t in [0, 2]
    X = (t_state**2)[:, None]
    z = pack(nlp.layout, [(X, np.zeros((8, 0)), 0.0, 2.0, np.zeros(0))])
    c = nlp.constraints(jnp.asarray(z))
    defects = c[: 8]
    np.testing.assert_allclose(np.asarray(defects), 0.0, atol=1e-10)
    # duration row = tf - t0 = 2
    np.testing.assert_allclose(float(c[-1]), 2.0, atol=1e-12)


def test_pack_unpack_roundtrip():
    ph = Phase(
        nx=2, nu=1, nq=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0] + q[0]]),
        mesh_degrees=(3,), mesh_fractions=(-1.0, 1.0),
        tf_bounds=(1.0, 1.0),
    )
    prob = Problem(phases=[ph])
    nlp = transcribe(prob)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((4, 2))
    U = rng.standard_normal((3, 1))
    q = rng.standard_normal(1)
    z = pack(nlp.layout, [(X, U, 0.3, 1.7, q)])
    X2, U2, t02, tf2, q2 = unpack_phase(nlp.layout.phases[0], jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(X2), X)
    np.testing.assert_allclose(np.asarray(U2), U)
    np.testing.assert_allclose(float(t02), 0.3)
    np.testing.assert_allclose(float(tf2), 1.7)
    np.testing.assert_allclose(np.asarray(q2), q)


def test_objective_quadrature():
    # min integral of u^2 with u = t on [0, 2] -> integral = 8/3
    ph = Phase(
        nx=1, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([u[0]]),
        lagrange=lambda x, u, t, q: u[0] ** 2,
        t0_bounds=(0.0, 0.0), tf_bounds=(2.0, 2.0),
        mesh_degrees=(5,), mesh_fractions=(-1.0, 1.0),
    )
    prob = Problem(phases=[ph])
    nlp = transcribe(prob)
    op = nlp.ops[0]
    t_col = (np.asarray(op.tau) + 1.0)  # [0, 2]
    X = np.zeros((6, 1))
    U = t_col[:, None]
    z = pack(nlp.layout, [(X, U, 0.0, 2.0, np.zeros(0))])
    np.testing.assert_allclose(float(nlp.objective(jnp.asarray(z))), 8.0 / 3.0, atol=1e-12)


def test_mayer_plus_event():
    ph = Phase(
        nx=1, nu=1, nevent=1,
        dynamics=lambda x, u, t, q: jnp.array([u[0]]),
        mayer=lambda x0, t0, xf, tf, q: xf[0] ** 2 + tf,
        event=lambda x0, t0, xf, tf, q: jnp.array([xf[0] - x0[0]]),
        event_bounds=(1.0, 1.0),
        tf_bounds=(1.0, 2.0),
        mesh_degrees=(3,), mesh_fractions=(-1.0, 1.0),
    )
    prob = Problem(phases=[ph])
    nlp = transcribe(prob)
    X = np.arange(4.0)[:, None]
    U = np.ones((3, 1))
    z = pack(nlp.layout, [(X, U, 0.0, 1.5, np.zeros(0))])
    np.testing.assert_allclose(float(nlp.objective(jnp.asarray(z))), 9.0 + 1.5)
    c = np.asarray(nlp.constraints(jnp.asarray(z)))
    # event row sits after 3 defect rows
    np.testing.assert_allclose(c[3], 3.0)
    # event bounds
    assert nlp.cl[3] == 1.0 and nlp.cu[3] == 1.0


def test_two_phase_linkage_layout_and_rows():
    def dyn(x, u, t, q):
        return jnp.array([u[0]])

    phases = [
        Phase(nx=1, nu=1, dynamics=dyn, t0_bounds=(0.0, 0.0), tf_bounds=(0.5, 1.5),
              mesh_degrees=(3,), mesh_fractions=(-1.0, 1.0)),
        Phase(nx=1, nu=1, dynamics=dyn, t0_bounds=(0.5, 1.5), tf_bounds=(2.0, 2.0),
              mesh_degrees=(4,), mesh_fractions=(-1.0, 1.0)),
    ]
    link = Linkage(left=0, right=1, nlink=1,
                   fn=lambda xfl, ql, x0r, qr: x0r - xfl)
    prob = Problem(phases=phases, linkages=[link])
    nlp = transcribe(prob)
    lay = nlp.layout
    assert lay.ncon_nl == 3 + 4 + 1       # defects + defects + link row
    assert lay.ncon == lay.ncon_nl + 2 + 1  # durations + time link
    X1 = np.array([[0.0], [0.1], [0.2], [0.3]])
    X2 = np.array([[0.9], [1.0], [1.1], [1.2], [1.3]])
    z = pack(lay, [
        (X1, np.ones((3, 1)), 0.0, 1.0, np.zeros(0)),
        (X2, np.ones((4, 1)), 1.25, 2.0, np.zeros(0)),
    ])
    c = np.asarray(nlp.constraints(jnp.asarray(z)))
    # link row: x0_right - xf_left = 0.9 - 0.3
    np.testing.assert_allclose(c[lay.link_offsets[0]], 0.6, atol=1e-12)
    # time-link row: t0_r - tf_l = 0.25
    np.testing.assert_allclose(c[-1], 0.25, atol=1e-12)
    # link + time-link bounds are equality zero
    assert nlp.cl[lay.link_offsets[0]] == 0.0 and nlp.cu[lay.link_offsets[0]] == 0.0
    assert nlp.cl[-1] == 0.0 and nlp.cu[-1] == 0.0


def test_variable_bounds_three_point_convention():
    ph = _poly_phase()
    prob = Problem(phases=[ph])
    nlp = transcribe(prob)
    # first state point pinned to 0, last to 4, interior in [-10, 10]
    assert nlp.zl[0] == 0.0 and nlp.zu[0] == 0.0
    assert nlp.zl[8] == 4.0 and nlp.zu[8] == 4.0
    assert np.all(nlp.zl[1:8] == -10.0) and np.all(nlp.zu[1:8] == 10.0)


def test_ad_consistency():
    ph = Phase(
        nx=2, nu=1, npath=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0] - jnp.sin(x[0])]),
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
        path=lambda x, u, t, q: jnp.array([x[0] ** 2 + u[0] ** 2]),
        path_bounds=(0.0, 2.0),
        tf_bounds=(1.0, 3.0),
        mesh_degrees=(4,), mesh_fractions=(-1.0, 1.0),
    )
    prob = Problem(phases=[ph])
    nlp = transcribe(prob)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal(nlp.n) * 0.3 + nlp.z0)
    check_grads(nlp.objective, (z,), order=2, modes=["fwd", "rev"], atol=1e-6, rtol=1e-6)
    check_grads(nlp.constraints, (z,), order=1, modes=["fwd", "rev"], atol=1e-6, rtol=1e-6)


def test_control_free_phase_integrates_exactly():
    # nu = 0: pure collocation BVP; degree-12 LGR integrates exp decay to
    # machine precision over [0, 2]
    from lpopc_tpu.core.solve import SolveOptions, solve

    ph = Phase(
        nx=1, nu=0,
        dynamics=lambda x, u, t, q: jnp.array([-x[0]]),
        x0_bounds=(1.0, 1.0), x_bounds=(-5.0, 5.0),
        t0_bounds=(0.0, 0.0), tf_bounds=(2.0, 2.0),
        mesh_degrees=(12,), mesh_fractions=(-1.0, 1.0),
    )
    sol = solve(Problem(phases=(ph,)), SolveOptions(mesh_method="none"))
    assert sol.solved
    np.testing.assert_allclose(sol.phases[0].x[-1, 0], np.exp(-2.0), atol=1e-12)


def test_jit_and_vmap_compatible():
    prob = Problem(phases=[_poly_phase()])
    nlp = transcribe(prob)
    zs = jnp.asarray(np.random.default_rng(2).standard_normal((5, nlp.n)))
    vals = jax.jit(jax.vmap(nlp.constraints))(zs)
    assert vals.shape == (5, nlp.m)
    objs = jax.jit(jax.vmap(nlp.objective))(zs)
    assert objs.shape == (5,)
