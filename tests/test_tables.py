"""Differentiable table lookups (ops/tables.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpopc_tpu.ops.tables import Spline1D, Spline2D


def test_1d_exact_on_linear():
    xs = np.array([0.0, 0.7, 1.1, 3.0])
    sp = Spline1D.fit(xs, 2.0 * xs - 1.0)
    t = np.linspace(-0.5, 3.5, 41)  # includes extrapolation
    np.testing.assert_allclose(np.asarray(sp(jnp.asarray(t))), 2.0 * t - 1.0,
                               atol=1e-12)


def test_1d_matches_host_spline():
    from lpopc_tpu.ops.interp import cubic_spline_interpolate

    rng = np.random.default_rng(0)
    xs = np.sort(rng.uniform(0, 10, 12))
    ys = rng.normal(size=12)
    t = np.linspace(xs[0], xs[-1], 57)
    sp = Spline1D.fit(xs, ys)
    np.testing.assert_allclose(
        np.asarray(sp(jnp.asarray(t))), cubic_spline_interpolate(xs, ys, t),
        atol=1e-12,
    )


def test_1d_accuracy_and_gradient():
    xs = np.linspace(0.0, np.pi, 25)
    sp = Spline1D.fit(xs, np.sin(xs))
    t = np.linspace(0.3, np.pi - 0.3, 101)  # interior (natural BC ends are O(h^2))
    err = np.max(np.abs(np.asarray(sp(jnp.asarray(t))) - np.sin(t)))
    assert err < 2e-6
    g = jax.vmap(jax.grad(sp))(jnp.asarray(t))
    gerr = np.max(np.abs(np.asarray(g) - np.cos(t)))
    assert gerr < 2e-4
    # C1 across a knot: one-sided AD derivatives agree
    k = xs[12]
    gl = float(jax.grad(sp)(jnp.asarray(k - 1e-9)))
    gr = float(jax.grad(sp)(jnp.asarray(k + 1e-9)))
    assert abs(gl - gr) < 1e-6


def test_1d_validation():
    with pytest.raises(ValueError, match="increasing"):
        Spline1D.fit([0.0, 0.0, 1.0], [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="mismatch"):
        Spline1D.fit([0.0, 1.0], [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="at least 2"):
        Spline1D.fit([0.0], [1.0])


def test_2d_exact_on_bilinear():
    xs = np.array([0.0, 1.0, 2.5])
    ys = np.array([-1.0, 0.5, 2.0, 3.0])
    f = lambda x, y: 2.0 + 3.0 * x - 1.5 * y
    Z = f(xs[:, None], ys[None, :])
    sp = Spline2D.fit(xs, ys, Z)
    xt = np.linspace(0.1, 2.4, 7)
    yt = np.linspace(-0.9, 2.9, 7)
    for x in xt:
        for y in yt:
            assert abs(float(sp(jnp.asarray(x), jnp.asarray(y))) - f(x, y)) < 1e-12


def test_2d_accuracy_and_gradient():
    xs = np.linspace(0.0, 2.0, 21)
    ys = np.linspace(0.0, 3.0, 25)
    f = lambda x, y: np.exp(-0.5 * x) * np.sin(y) + 0.1 * x * y
    Z = f(xs[:, None], ys[None, :])
    sp = Spline2D.fit(xs, ys, Z)
    rng = np.random.default_rng(1)
    xq = rng.uniform(0.3, 1.7, 40)
    yq = rng.uniform(0.4, 2.6, 40)
    vals = np.asarray(sp(jnp.asarray(xq), jnp.asarray(yq)))
    np.testing.assert_allclose(vals, f(xq, yq), atol=5e-5)
    # gradients vs analytic
    gx = jax.vmap(jax.grad(sp, argnums=0))(jnp.asarray(xq), jnp.asarray(yq))
    gy = jax.vmap(jax.grad(sp, argnums=1))(jnp.asarray(xq), jnp.asarray(yq))
    np.testing.assert_allclose(
        np.asarray(gx), -0.5 * np.exp(-0.5 * xq) * np.sin(yq) + 0.1 * yq, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(gy), np.exp(-0.5 * xq) * np.cos(yq) + 0.1 * xq, atol=3e-3
    )


def test_2d_validation():
    with pytest.raises(ValueError, match="does not match"):
        Spline2D.fit([0.0, 1.0], [0.0, 1.0, 2.0], np.zeros((3, 2)))


def test_tables_are_pytrees_and_jit_friendly():
    xs = np.linspace(0.0, 1.0, 9)
    sp = Spline1D.fit(xs, xs**2)

    @jax.jit
    def use(table, x):
        return table(x) + 1.0

    v = float(use(sp, jnp.asarray(0.37)))
    assert abs(v - (0.37**2 + 1.0)) < 1e-4
    # second call with a new (same-structure) table: no retrace crash
    sp2 = Spline1D.fit(xs, xs**3)
    v2 = float(use(sp2, jnp.asarray(0.5)))
    assert abs(v2 - (0.125 + 1.0)) < 1e-3
    # hessian (the IPM needs C2 data): finite and matches 2.0 for x^2 interior
    h = float(jax.hessian(sp)(jnp.asarray(0.5)))
    assert abs(h - 2.0) < 0.15
