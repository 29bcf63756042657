"""Block-structured condensed-KKT factorization vs dense reference.

Pins two claims: (1) the segment-interior/separator permutation built by
``make_block_spec`` really renders the interior block-diagonal — i.e. the
block factorization solves the EXACT K assembled from a real multi-phase
transcription (events, paths, parameters, linkages, mixed segment degrees) —
and (2) the IPM converges to the same solution with the block factorizer
swapped in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpopc_tpu.core.block_kkt import make_block_factorizer, make_block_spec
from lpopc_tpu.core.ipm import SOLVED
from lpopc_tpu.core.problem import Linkage, Phase, Problem
from lpopc_tpu.core.solve import SolveOptions, solve_on_mesh
from lpopc_tpu.core.structured import (
    make_structured_hessian,
    make_structured_jacobian,
)
from lpopc_tpu.core.transcribe import make_layout, make_phase_ops, transcribe


def _two_phase_problem():
    """2-phase double integrator with path rows, events, a static parameter
    and a mass-drop-style linkage; deliberately mixed segment degrees
    (including a degree-1 segment: no interior state points in its block)."""
    dyn = lambda x, u, t, q: jnp.array([x[1], u[0] - q[0] * x[1]])
    path = lambda x, u, t, q: jnp.array([x[0] ** 2 + u[0] ** 2])
    p1 = Phase(
        nx=2, nu=1, nq=1, npath=1, nevent=1,
        dynamics=dyn, path=path,
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
        event=lambda x0, t0, xf, tf, q: jnp.array([xf[0] + q[0]]),
        x0_bounds=(np.array([0.0, 0.0]), np.array([0.0, 0.0])),
        x_bounds=(-10.0, 10.0), u_bounds=(-5.0, 5.0),
        q_bounds=(0.1, 2.0), path_bounds=(-100.0, 100.0),
        event_bounds=(-1.0, 1.0),
        t0_bounds=(0.0, 0.0), tf_bounds=(1.0, 1.0),
        mesh_degrees=(4, 1, 6), mesh_fractions=(-1.0, -0.2, 0.3, 1.0),
    )
    p2 = Phase(
        nx=2, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0]]),
        mayer=lambda x0, t0, xf, tf, q: xf[0] ** 2 + xf[1] ** 2,
        x_bounds=(-10.0, 10.0), u_bounds=(-5.0, 5.0),
        t0_bounds=(1.0, 1.0), tf_bounds=(2.0, 2.0),
        mesh_degrees=(5, 5), mesh_fractions=(-1.0, 0.0, 1.0),
    )
    link = Linkage(
        left=0, right=1, nlink=2,
        fn=lambda xfl, ql, x0r, qr: x0r - xfl + jnp.array([0.0, 0.1]) * ql[0],
    )
    return Problem(phases=(p1, p2), linkages=(link,), name="blocktest")


def test_spec_partitions_variables():
    prob = _two_phase_problem()
    layout = make_layout(prob)
    ops = make_phase_ops(prob)
    spec = make_block_spec(layout, ops)
    assert spec is not None
    got = np.concatenate(
        [spec.interior_idx[spec.interior_mask].ravel(), spec.border_idx]
    )
    assert np.array_equal(np.sort(got), np.arange(layout.nvar))
    # one block per segment across phases: 3 + 2
    assert spec.num_blocks == 5


def test_block_solve_matches_dense_on_real_kkt():
    prob = _two_phase_problem()
    layout = make_layout(prob)
    ops = make_phase_ops(prob)
    nlp = transcribe(prob)
    jac = make_structured_jacobian(prob, layout, ops)
    hess = make_structured_hessian(prob, layout, ops)
    rng = np.random.default_rng(3)
    z = jnp.asarray(nlp.z0 + 0.01 * rng.standard_normal(layout.nvar))
    lam = jnp.asarray(rng.standard_normal(layout.ncon))
    J = np.asarray(jac(z))
    H = np.asarray(hess(z, lam))
    d = rng.uniform(0.5, 2.0, layout.ncon)
    # a diagonal shift large enough to make this (indefinite-H) K SPD
    K = H + (J.T * d) @ J
    K = K + (abs(min(np.linalg.eigvalsh(K).min(), 0.0)) + 1.0) * np.eye(layout.nvar)
    spec = make_block_spec(layout, ops)
    factorize, solve, factor_ok = make_block_factorizer(spec)
    F = jax.jit(factorize)(jnp.asarray(K))
    assert bool(factor_ok(F))
    r = rng.standard_normal(layout.nvar)
    x_blk = np.asarray(jax.jit(solve)(F, jnp.asarray(r)))
    x_ref = np.linalg.solve(K, r)
    np.testing.assert_allclose(x_blk, x_ref, rtol=0, atol=1e-9 * np.abs(x_ref).max())


def test_block_factor_flags_indefinite():
    prob = _two_phase_problem()
    layout = make_layout(prob)
    ops = make_phase_ops(prob)
    spec = make_block_spec(layout, ops)
    factorize, _, factor_ok = make_block_factorizer(spec)
    K = -np.eye(layout.nvar)
    F = factorize(jnp.asarray(K))
    assert not bool(factor_ok(F))


@pytest.mark.parametrize("mode", ["on", "off"])
def test_ipm_with_block_kkt_matches_dense(mode):
    from lpopc_tpu.models.hypersensitive import make_problem

    prob = make_problem(tf=40.0, degrees=(6, 6, 6, 6))
    opts = SolveOptions(mesh_method="none", block_kkt=mode)
    sol = solve_on_mesh(prob, opts)
    assert sol.status == SOLVED
    # golden value for this horizon: boundary-layer objective ~= x0^2*... use
    # cross-mode agreement instead of an oracle: stash in module cache
    key = "objective"
    store = test_ipm_with_block_kkt_matches_dense.__dict__.setdefault("vals", {})
    store[mode] = sol.objective
    if len(store) == 2:
        np.testing.assert_allclose(store["on"], store["off"], rtol=1e-8)
