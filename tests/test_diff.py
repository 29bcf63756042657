"""Implicit differentiation through the converged solve (core/diff.py).

Validates the IFT/KKT adjoint VJP against (a) central finite differences of
the actual batched solver and (b) the independent dual-based envelope
sensitivities, plus (c) the Bryson–Denham analytic dJ*/dl.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpopc_tpu.core.diff import DifferentiableSolver
from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import brachistochrone, brysondenham
from lpopc_tpu.parallel.batch import make_batch_solver


def _options():
    return SolveOptions(ipm=IPMOptions(tol=1e-10, max_iter=80))


@pytest.fixture(scope="module")
def brach():
    bs = make_batch_solver(brachistochrone.make_problem(degrees=(6, 6)), _options())
    return bs, DifferentiableSolver(bs)


def _xf_rows(bs):
    pl = bs.nlp.layout.phases[0]
    npts, nx = pl.npts, pl.nx
    off = pl.var_offset + (npts - 1) * nx
    return slice(off, off + 2)


def test_gradient_matches_finite_differences(brach):
    """d(objective)/d(terminal-target pins) vs central FD of the solver."""
    bs, dsol = brach
    batch = 2
    z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
    rows = _xf_rows(bs)
    # move the pinned (xf, yf) target off-nominal so the gradient is generic
    d = np.array([[0.07, -0.04], [-0.05, 0.06]]) * bs.scaled.var_scale[rows][None, :]
    zl[:, rows] += d
    zu[:, rows] += d
    z0[:, rows] += d
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))

    def loss(zl_, zu_):
        _, _, _, obj = dsol(args[0], zl_, zu_, args[3], args[4])
        return jnp.sum(obj)

    g_zl, g_zu = jax.grad(loss, argnums=(0, 1))(args[1], args[2])
    # a pinned row moves BOTH zl and zu together: total derivative = sum
    g = np.asarray(g_zl + g_zu)[:, rows]

    # central finite differences of the compiled solver
    eps = 1e-6
    fd = np.zeros_like(g)
    for j in range(2):
        for sgn, sign in ((1.0, +1), (-1.0, -1)):
            zlp = np.array(zl)
            zup = np.array(zu)
            z0p = np.array(z0)
            zlp[:, rows.start + j] += sign * eps
            zup[:, rows.start + j] += sign * eps
            res = bs.run(*map(jnp.asarray, (z0p, zlp, zup, cl, cu)))
            assert np.all(np.asarray(res.status) == SOLVED)
            fd[:, j] += sign * np.asarray(res.objective) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=2e-4, atol=1e-8)


def test_matches_dual_envelope_sensitivities(brach):
    """dJ*/dx0 via the KKT adjoint == the independent dual-based
    x0_sensitivities (reduced-gradient/envelope) path."""
    bs, dsol = brach
    batch = 2
    rng = np.random.default_rng(3)
    z0, zl, zu, cl, cu = bs.perturb_x0(
        batch, 0, 0.05 * rng.uniform(-1, 1, (batch, 3))
    )
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
    res = bs.run(*args)
    assert np.all(np.asarray(res.status) == SOLVED)
    dual_sens = bs.x0_sensitivities(res)  # (batch, nx), unscaled, NaN if free

    def loss(zl_, zu_):
        _, _, _, obj = dsol(args[0], zl_, zu_, args[3], args[4])
        return jnp.sum(obj)

    g_zl, g_zu = jax.grad(loss, argnums=(0, 1))(args[1], args[2])
    pl = bs.nlp.layout.phases[0]
    sl = slice(pl.var_offset, pl.var_offset + pl.nx)
    g_scaled = np.asarray(g_zl + g_zu)[:, sl]
    # scaled-space chain rule: J_s = obj_scale*J, z_s = var_scale*z
    g_unscaled = g_scaled * np.asarray(bs.scaled.var_scale)[sl][None, :] / float(
        np.asarray(bs.scaled.obj_scale)
    )
    mask = np.isfinite(dual_sens)
    assert mask.any()
    np.testing.assert_allclose(
        g_unscaled[mask], dual_sens[mask], rtol=1e-5, atol=1e-7
    )


def test_bryson_denham_bound_sensitivity():
    """dJ*/dl for the x1 <= l path bound: analytic J*(l) = 4/(9l) gives
    dJ*/dl = -4/(9 l^2) = -36 at l = 1/9."""
    l = 1.0 / 9.0
    bs = make_batch_solver(
        brysondenham.make_problem(l=l, degrees=(8,) * 4), _options()
    )
    dsol = DifferentiableSolver(bs)
    z0, zl, zu, cl, cu = bs.nominal_inputs(1)
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
    res = bs.run(*args)
    assert np.all(np.asarray(res.status) == SOLVED)
    obj_scale = float(np.asarray(bs.scaled.obj_scale))
    J = float(np.asarray(res.objective)[0]) / obj_scale
    assert abs(J - 4.0) < 2e-3

    def loss(zu_):
        _, _, _, obj = dsol(args[0], args[1], zu_, args[3], args[4])
        return jnp.sum(obj)

    g_zu = np.asarray(jax.grad(loss)(args[2]))[0]
    # rows whose upper bound is the path level l: interior x1 points
    pl = bs.nlp.layout.phases[0]
    vs = np.asarray(bs.scaled.var_scale)
    raw_zu = np.asarray(bs.nlp.zu)
    rows = [
        pl.var_offset + k * pl.nx
        for k in range(1, pl.npts - 1)
        if abs(raw_zu[pl.var_offset + k * pl.nx] - l) < 1e-12
    ]
    assert rows
    # dJ/dl = sum over those rows of dJ_s/d(zu_s) * var_scale / obj_scale
    dj_dl = sum(g_zu[r] * vs[r] for r in rows) / obj_scale
    assert abs(dj_dl - (-36.0)) < 0.2, dj_dl

    # cross-check against finite differences of the solver itself
    eps = 1e-6
    vals = []
    for sign in (+1, -1):
        p2 = brysondenham.make_problem(l=l + sign * eps, degrees=(8,) * 4)
        bs2 = make_batch_solver(p2, _options())
        r2 = bs2.run(*(jnp.asarray(a) for a in bs2.nominal_inputs(1)))
        assert np.all(np.asarray(r2.status) == SOLVED)
        vals.append(
            float(np.asarray(r2.objective)[0])
            / float(np.asarray(bs2.scaled.obj_scale))
        )
    fd = (vals[0] - vals[1]) / (2 * eps)
    np.testing.assert_allclose(dj_dl, fd, rtol=5e-3)


def test_trajectory_cotangent(brach):
    """Gradients flow through a TRAJECTORY functional (not just the
    objective): L = final speed^2 read from z*."""
    bs, dsol = brach
    z0, zl, zu, cl, cu = bs.nominal_inputs(1)
    rows = _xf_rows(bs)
    pl = bs.nlp.layout.phases[0]
    vrow = pl.var_offset + (pl.npts - 1) * pl.nx + 2  # terminal speed v(tf)
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))

    def loss(zl_, zu_):
        z, _, _, _ = dsol(args[0], zl_, zu_, args[3], args[4])
        return jnp.sum(z[:, vrow] ** 2)

    g_zl, g_zu = jax.grad(loss, argnums=(0, 1))(args[1], args[2])
    g = np.asarray(g_zl + g_zu)[:, rows]
    assert np.all(np.isfinite(g))

    eps = 1e-6
    fd = np.zeros((1, 2))
    for j in range(2):
        for sign in (+1, -1):
            zlp = np.array(zl)
            zup = np.array(zu)
            zlp[:, rows.start + j] += sign * eps
            zup[:, rows.start + j] += sign * eps
            res = bs.run(*map(jnp.asarray, (z0, zlp, zup, cl, cu)))
            fd[:, j] += sign * float(np.asarray(res.z)[0, vrow]) ** 2 / (2 * eps)
    # atol covers central-FD noise (~1e-8/eps) on near-zero components
    np.testing.assert_allclose(g, fd, rtol=1e-3, atol=1e-6)
