"""Interior-point solver tests on NLPs with known solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpopc_tpu.core.ipm import FAILED, SOLVED, IPMOptions, build_solver
from lpopc_tpu.core.problem import INF


def _solve(obj, con, n, m, z0, zl=None, zu=None, cl=None, cu=None, **kw):
    zl = np.full(n, -INF) if zl is None else np.asarray(zl, float)
    zu = np.full(n, INF) if zu is None else np.asarray(zu, float)
    cl = np.zeros(m) if cl is None else np.asarray(cl, float)
    cu = np.zeros(m) if cu is None else np.asarray(cu, float)
    solver = build_solver(obj, con, n, m, IPMOptions(**kw))
    return jax.jit(solver)(
        jnp.asarray(z0, jnp.float64), jnp.asarray(zl), jnp.asarray(zu),
        jnp.asarray(cl), jnp.asarray(cu),
    )


def test_bound_constrained_qp():
    # min 1/2 ||z - (-1)||^2 with z >= 1  ->  z = 1
    obj = lambda z: 0.5 * jnp.sum((z + 1.0) ** 2)
    con = lambda z: jnp.zeros((0,))
    res = _solve(obj, con, 3, 0, z0=np.full(3, 2.0), zl=np.ones(3))
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res.z), 1.0, atol=1e-7)
    # bound duals equal the gradient at the solution
    np.testing.assert_allclose(np.asarray(res.zl_dual[:3]), 2.0, atol=1e-6)


def test_equality_constrained_qp_matches_closed_form():
    rng = np.random.default_rng(0)
    n, m = 6, 2
    Q = np.diag(rng.uniform(1.0, 3.0, n))
    p = rng.standard_normal(n)
    B = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    # closed form from the KKT system
    K = np.block([[Q, B.T], [B, np.zeros((m, m))]])
    sol = np.linalg.solve(K, np.concatenate([-p, b]))
    z_star = sol[:n]
    obj = lambda z: 0.5 * z @ (jnp.asarray(Q) @ z) + jnp.asarray(p) @ z
    con = lambda z: jnp.asarray(B) @ z
    res = _solve(obj, con, n, m, z0=np.zeros(n), cl=b, cu=b)
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res.z), z_star, atol=1e-6)
    # multipliers match the closed-form lambda (sign: L = f + lam @ (Bz - b))
    np.testing.assert_allclose(np.asarray(res.lam), sol[n:], atol=1e-5)


def test_inequality_active():
    # min x^2 + y^2  s.t. x + y >= 1  ->  (0.5, 0.5)
    obj = lambda z: jnp.sum(z**2)
    con = lambda z: jnp.array([z[0] + z[1]])
    res = _solve(obj, con, 2, 1, z0=np.zeros(2), cl=[1.0], cu=[INF])
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res.z), [0.5, 0.5], atol=1e-7)


def test_inequality_inactive():
    # min (x-0.2)^2 s.t. x <= 5 (inactive)
    obj = lambda z: jnp.sum((z - 0.2) ** 2)
    con = lambda z: jnp.array([z[0]])
    res = _solve(obj, con, 1, 1, z0=np.array([3.0]), cl=[-INF], cu=[5.0])
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res.z), [0.2], atol=1e-7)


def test_hs071():
    # Hock-Schittkowski 71 (the classic IPOPT example problem):
    # min x1 x4 (x1 + x2 + x3) + x3
    # s.t. x1 x2 x3 x4 >= 25;  x1^2+x2^2+x3^2+x4^2 = 40;  1 <= x <= 5
    obj = lambda z: z[0] * z[3] * (z[0] + z[1] + z[2]) + z[2]
    con = lambda z: jnp.array([z[0] * z[1] * z[2] * z[3], jnp.sum(z**2)])
    res = _solve(
        obj, con, 4, 2,
        z0=np.array([1.0, 5.0, 5.0, 1.0]),
        zl=np.ones(4), zu=np.full(4, 5.0),
        cl=[25.0, 40.0], cu=[INF, 40.0],
    )
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(
        np.asarray(res.z), [1.0, 4.74299964, 3.82114998, 1.37940829], atol=1e-5
    )
    np.testing.assert_allclose(float(res.objective), 17.0140173, atol=1e-5)


def test_rosenbrock_unconstrained():
    obj = lambda z: (1 - z[0]) ** 2 + 100 * (z[1] - z[0] ** 2) ** 2
    con = lambda z: jnp.zeros((0,))
    res = _solve(obj, con, 2, 0, z0=np.array([-1.2, 1.0]))
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res.z), [1.0, 1.0], atol=1e-6)


def test_fixed_variables():
    # one variable pinned by equal bounds participates in the objective
    obj = lambda z: jnp.sum((z - 3.0) ** 2)
    con = lambda z: jnp.array([z[0] + z[1]])
    res = _solve(
        obj, con, 2, 1,
        z0=np.array([0.0, 0.0]),
        zl=np.array([1.5, -INF]), zu=np.array([1.5, INF]),
        cl=[-INF], cu=[INF],
    )
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.asarray(res.z), [1.5, 3.0], atol=1e-7)


def test_vmap_batch_perturbed_instances():
    # batched solves with per-instance bounds; all instances must converge to
    # their own solution independently
    obj = lambda z: jnp.sum(z**2)
    con = lambda z: jnp.array([z[0] + z[1]])
    solver = build_solver(obj, con, 2, 1, IPMOptions())
    B = 16
    rhs = np.linspace(0.5, 4.0, B)
    z0 = np.zeros((B, 2))
    zl = np.full((B, 2), -INF)
    zu = np.full((B, 2), INF)
    cl = rhs[:, None]
    cu = np.full((B, 1), INF)
    res = jax.jit(jax.vmap(solver))(
        jnp.asarray(z0), jnp.asarray(zl), jnp.asarray(zu), jnp.asarray(cl), jnp.asarray(cu)
    )
    assert np.all(np.asarray(res.status) == SOLVED)
    np.testing.assert_allclose(np.asarray(res.z), np.stack([rhs / 2, rhs / 2], axis=1), atol=1e-6)
    # instances converge at different iteration counts but none poisons others
    assert np.asarray(res.iterations).min() >= 1


def test_nonconvex_requires_regularization():
    # concave objective on a box: needs delta_w to make K positive definite
    obj = lambda z: -jnp.sum(z**2)
    con = lambda z: jnp.zeros((0,))
    res = _solve(obj, con, 2, 0, z0=np.array([0.3, -0.2]), zl=np.full(2, -1.0), zu=np.full(2, 1.0))
    assert int(res.status) == SOLVED
    np.testing.assert_allclose(np.abs(np.asarray(res.z)), 1.0, atol=1e-6)
