"""Matrix-free structured KKT (core/kkt_blocks.py) vs the dense path.

Pins, on both a many-segment single-phase problem and the 4-phase launch
(events, path rows, linkages, parameters):
* jv/jtv/hv matvecs == dense structured J/H products,
* direct per-segment (A, B, C) assembly == dense K gathered by the spec,
* block solve == dense solve,
* a full IPM solve through the structured path == the dense-assembly path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpopc_tpu.core.block_kkt import make_block_spec
from lpopc_tpu.core.kkt_blocks import bind_structured_kkt, make_structured_kkt
from lpopc_tpu.core.structured import (
    make_structured_hessian,
    make_structured_jacobian,
)
from lpopc_tpu.core.transcribe import const_mesh, transcribe
from lpopc_tpu.models import hypersensitive, launch


def _setup(problem, seed=0, scale=True):
    nlp = transcribe(problem)
    spec = make_block_spec(nlp.layout, nlp.ops)
    sk = make_structured_kkt(problem, nlp.layout, spec)
    mesh = const_mesh(nlp.ops)
    n, m = nlp.n, nlp.m
    rng = np.random.default_rng(seed)
    if scale:
        sf = 0.7
        sc = np.exp(0.2 * rng.standard_normal(m))
        v = np.exp(0.1 * rng.standard_normal(n))
    else:
        sf, sc, v = 1.0, np.ones(m), np.ones(n)
    bound = bind_structured_kkt(sk, mesh, sf, jnp.asarray(sc), jnp.asarray(1.0 / v))
    # scaled-space evaluation point near the guess
    z_s = jnp.asarray(nlp.z0 * v + 0.01 * rng.standard_normal(n))
    lam = jnp.asarray(rng.standard_normal(m))
    # dense scaled J/H for comparison (same algebra as ScaledNLP.wrap_structured)
    jac_raw = make_structured_jacobian(problem, nlp.layout, nlp.ops)
    hess_raw = make_structured_hessian(problem, nlp.layout, nlp.ops)
    vj = jnp.asarray(v)
    scj = jnp.asarray(sc)
    J = np.asarray((scj[:, None] * jac_raw(z_s / vj)) / vj[None, :])
    H = np.asarray(
        hess_raw(z_s / vj, scj * lam, sf) / (vj[:, None] * vj[None, :])
    )
    return nlp, spec, bound, z_s, lam, J, H, rng


PROBLEMS = {
    "hypersensitive": lambda: hypersensitive.make_problem(tf=40.0, degrees=(5, 4, 6, 5)),
    "launch": lambda: launch.make_problem(),
}


@pytest.mark.parametrize("name", list(PROBLEMS))
def test_matvecs_match_dense(name):
    problem = PROBLEMS[name]()
    nlp, spec, bound, z_s, lam, J, H, rng = _setup(problem)
    jb = bound.jac_blocks(z_s)
    hb = bound.hess_blocks(z_s, lam)
    v = rng.standard_normal(nlp.n)
    u = rng.standard_normal(nlp.m)
    np.testing.assert_allclose(
        np.asarray(bound.jv(jb, jnp.asarray(v))), J @ v, rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(bound.jtv(jb, jnp.asarray(u))), J.T @ u, rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(bound.hv(hb, jnp.asarray(v))), H @ v, rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("name", list(PROBLEMS))
def test_block_assembly_matches_dense_K(name):
    problem = PROBLEMS[name]()
    nlp, spec, bound, z_s, lam, J, H, rng = _setup(problem)
    jb = bound.jac_blocks(z_s)
    hb = bound.hess_blocks(z_s, lam)
    d = np.abs(rng.standard_normal(nlp.m)) + 0.1
    wdiag = np.abs(rng.standard_normal(nlp.n)) + 0.1
    sk = make_structured_kkt(problem, nlp.layout, spec)
    A, B, C = jax.tree_util.tree_map(
        np.asarray, sk.assemble(jb, hb, jnp.asarray(d), jnp.asarray(wdiag))
    )
    K = H + np.diag(wdiag) + (J.T * d) @ J
    ii, mask, bi = spec.interior_idx, spec.interior_mask, spec.border_idx
    for s in range(spec.num_blocks):
        cols = ii[s][mask[s]]
        np.testing.assert_allclose(
            A[s][np.ix_(mask[s], mask[s])], K[np.ix_(cols, cols)],
            rtol=1e-9, atol=1e-9, err_msg=f"A block {s}",
        )
        # padded slots must carry exact identity
        pad = ~mask[s]
        if pad.any():
            np.testing.assert_allclose(
                A[s][np.ix_(pad, pad)], np.eye(int(pad.sum())), atol=0
            )
        np.testing.assert_allclose(
            B[s][:, mask[s]], K[np.ix_(bi, cols)], rtol=1e-9, atol=1e-9,
            err_msg=f"B block {s}",
        )
    np.testing.assert_allclose(C, K[np.ix_(bi, bi)], rtol=1e-9, atol=1e-9)


def test_block_solve_matches_dense_solve():
    problem = PROBLEMS["launch"]()
    nlp, spec, bound, z_s, lam, J, H, rng = _setup(problem)
    jb = bound.jac_blocks(z_s)
    # make K comfortably SPD: large wdiag
    hb = bound.hess_blocks(z_s, jnp.zeros(nlp.m))
    d = np.abs(rng.standard_normal(nlp.m)) + 0.5
    wdiag = np.full(nlp.n, 50.0)
    F = bound.factorize(jb, hb, jnp.asarray(d), jnp.asarray(wdiag))
    assert bool(bound.factor_ok(F))
    r = rng.standard_normal(nlp.n)
    x_blk = np.asarray(bound.fsolve(F, jnp.asarray(r)))
    # residual check through the (already dense-verified) matvecs: K x == r
    Kx = (
        np.asarray(bound.hv(hb, jnp.asarray(x_blk)))
        + wdiag * x_blk
        + np.asarray(bound.jtv(jb, jnp.asarray(d) * bound.jv(jb, jnp.asarray(x_blk))))
    )
    np.testing.assert_allclose(Kx, r, rtol=1e-8, atol=1e-8)


def test_ipm_structured_path_matches_dense_path():
    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions, solve_on_mesh

    problem = hypersensitive.make_problem(tf=40.0, degrees=(8,) * 10)
    base = dict(ipm=IPMOptions(tol=1e-8, max_iter=100), block_kkt="on")
    s_direct = solve_on_mesh(problem, SolveOptions(**base, block_assembly="direct"))
    s_dense = solve_on_mesh(problem, SolveOptions(**base, block_assembly="dense"))
    assert s_direct.status == SOLVED and s_dense.status == SOLVED
    assert abs(s_direct.objective - s_dense.objective) < 1e-9
    np.testing.assert_allclose(s_direct.z, s_dense.z, atol=1e-7)


def test_ipm_structured_path_multiphase():
    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions, solve_on_mesh

    problem = launch.make_problem()
    sol = solve_on_mesh(problem, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=100), block_kkt="on",
        block_assembly="direct",
    ))
    assert sol.status == SOLVED
    # published Delta-III GTO payload-optimal final mass (scaled objective)
    assert abs(sol.objective - (-0.024977981)) < 1e-6
