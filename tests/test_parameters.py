"""Static (design) parameter support: transcription, structured derivatives,
and end-to-end optimization of a per-phase parameter vector q."""

import jax
import jax.numpy as jnp
import numpy as np

from lpopc_tpu.core.problem import Phase, Problem
from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.core.structured import make_structured_hessian, make_structured_jacobian
from lpopc_tpu.core.transcribe import transcribe


def _design_problem():
    # min tf with dx = q*u, |u|<=1, q in [0.5, 2]; x: 0 -> 1.
    # Optimal: u=1, q=2, tf = 0.5. Exercises q in dynamics AND a q-dependent
    # running cost + a q event.
    return Problem(phases=(Phase(
        nx=1, nu=1, nq=1, nevent=1,
        dynamics=lambda x, u, t, q: jnp.array([q[0] * u[0]]),
        mayer=lambda x0, t0, xf, tf, q: tf,
        lagrange=lambda x, u, t, q: 1e-6 * (u[0] ** 2 + q[0] ** 2),
        event=lambda x0, t0, xf, tf, q: jnp.array([q[0] * tf]),
        event_bounds=(0.0, 10.0),
        x0_bounds=(0.0, 0.0), xf_bounds=(1.0, 1.0), x_bounds=(-5.0, 5.0),
        u_bounds=(-1.0, 1.0), q_bounds=(0.5, 2.0),
        t0_bounds=(0.0, 0.0), tf_bounds=(0.05, 10.0),
        mesh_degrees=(4,), mesh_fractions=(-1.0, 1.0),
    ),))


def test_parameter_optimized_to_bound():
    sol = solve(_design_problem(), SolveOptions(mesh_method="none"))
    assert sol.solved
    np.testing.assert_allclose(sol.phases[0].q, [2.0], atol=1e-6)
    np.testing.assert_allclose(sol.phases[0].tf, 0.5, atol=1e-4)
    np.testing.assert_allclose(sol.phases[0].u[:, 0], 1.0, atol=1e-4)


def test_structured_derivatives_with_parameters():
    problem = _design_problem()
    nlp = transcribe(problem)
    rng = np.random.default_rng(0)
    z = jnp.asarray(nlp.z0 + 0.1 * rng.standard_normal(nlp.n))
    lam = jnp.asarray(rng.standard_normal(nlp.m))
    J_ref = np.asarray(jax.jacfwd(nlp.constraints)(z))
    J_st = np.asarray(make_structured_jacobian(problem, nlp.layout, nlp.ops)(z))
    np.testing.assert_allclose(J_st, J_ref, atol=1e-9)
    H_ref = np.asarray(
        jax.hessian(lambda zz: nlp.objective(zz) + lam @ nlp.constraints(zz))(z)
    )
    H_st = np.asarray(make_structured_hessian(problem, nlp.layout, nlp.ops)(z, lam))
    np.testing.assert_allclose(H_st, H_ref, atol=1e-9)


def test_linked_parameters_two_phase():
    # q must agree across phases through a linkage on parameters
    def dyn(x, u, t, q):
        return jnp.array([q[0] * u[0]])

    phases = (
        Phase(nx=1, nu=1, nq=1, dynamics=dyn,
              mayer=None, lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
              x0_bounds=(0.0, 0.0), x_bounds=(-5.0, 5.0), u_bounds=(-5.0, 5.0),
              q_bounds=(0.5, 2.0), t0_bounds=(0.0, 0.0), tf_bounds=(1.0, 1.0),
              mesh_degrees=(4,), mesh_fractions=(-1.0, 1.0)),
        Phase(nx=1, nu=1, nq=1, dynamics=dyn,
              lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
              xf_bounds=(1.0, 1.0), x_bounds=(-5.0, 5.0), u_bounds=(-5.0, 5.0),
              q_bounds=(0.5, 2.0), t0_bounds=(1.0, 1.0), tf_bounds=(2.0, 2.0),
              mesh_degrees=(4,), mesh_fractions=(-1.0, 1.0)),
    )
    from lpopc_tpu.core.problem import Linkage

    links = (
        Linkage(left=0, right=1, nlink=2,
                fn=lambda xfl, ql, x0r, qr: jnp.concatenate([x0r - xfl, qr - ql])),
    )
    sol = solve(Problem(phases=phases, linkages=links),
                SolveOptions(mesh_method="none"))
    assert sol.solved
    np.testing.assert_allclose(sol.phases[0].q, sol.phases[1].q, atol=1e-7)
    # state continuous across phases
    np.testing.assert_allclose(sol.phases[0].x[-1], sol.phases[1].x[0], atol=1e-7)
