"""Differentiable tabulated-data lookups for use INSIDE problem functions.

Reference-class optimal-control workflows routinely need tabulated data in
the dynamics — atmosphere models, thrust decks T(h, M), aero coefficients
CD0(M)/CLα(M) (e.g. the classic Bryson minimum-time-to-climb, a GPOPS-class
benchmark). The reference library has no such facility (its examples use
closed-form models only); finite-difference NLP codes tolerate C0 linear
interpolation, but a Newton interior-point method wants C2 data — kinked
derivatives produce zero curvature a.e. and chattering steps at the
breakpoints.

TPU-first design:

* Tables are **pytree dataclasses** whose coefficient arrays are baked at
  construction (host-side tridiagonal solves, :mod:`.interp` math); traced
  evaluation is branch-free — the cell index comes from a vectorized
  comparison reduction (``sum(x >= knots) - 1``), never a data-dependent
  Python branch, so everything jits/vmaps cleanly.
* Evaluation is a handful of gathers + fused polynomial arithmetic: cheap
  VPU work inside the vmapped dynamics.
* :class:`Spline1D` is the natural cubic spline (C2); :class:`Spline2D` is
  its tensor product (bicubic through the value grid, the standard spline
  surface). Both are exact on (bi)linear data and O(h⁴) on smooth data.
* Outside the knot range, evaluation continues the END cubic (C2 at the
  boundary, polynomial extrapolation): keep state/control bounds within
  the tabulated range for physical fidelity; the extension exists so
  intermediate IPM iterates cannot produce NaNs.

Second derivatives of a natural spline are a LINEAR map of the values
(``M = S y`` with S = T⁻¹ B from the tridiagonal system), which is what
makes the 2-D tensor product a set of four precomputable corner arrays
(values, d²/dx², d²/dy², d⁴/dx²dy²).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


def _second_derivative_operator(x: np.ndarray) -> np.ndarray:
    """Dense (n, n) operator S with ``M = S @ y`` the natural-spline second
    derivatives at the knots (linear in the values)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n < 3:
        return np.zeros((n, n))
    h = np.diff(x)
    T = np.zeros((n - 2, n - 2))
    B = np.zeros((n - 2, n))
    for i in range(n - 2):
        T[i, i] = 2.0 * (h[i] + h[i + 1])
        if i > 0:
            T[i, i - 1] = h[i]
        if i < n - 3:
            T[i, i + 1] = h[i + 1]
        B[i, i] = 6.0 / h[i]
        B[i, i + 1] = -6.0 / h[i] - 6.0 / h[i + 1]
        B[i, i + 2] = 6.0 / h[i + 1]
    S = np.zeros((n, n))
    S[1:-1, :] = np.linalg.solve(T, B)
    return S


def _cell_index(knots: jnp.ndarray, x):
    """Branch-free interval index in [0, n-2] (comparison reduction)."""
    idx = jnp.sum(x >= knots[1:-1]) if knots.shape[0] > 2 else jnp.zeros((), jnp.int32)
    return jnp.clip(idx, 0, knots.shape[0] - 2).astype(jnp.int32)


def _eval_weights(knots, idx, x):
    """The four 1-D spline weights: f = a0 y[i] + a1 y[i+1] + b0 M[i] + b1 M[i+1]."""
    x0 = knots[idx]
    x1 = knots[idx + 1]
    h = x1 - x0
    t0 = (x1 - x) / h
    t1 = (x - x0) / h
    a0, a1 = t0, t1
    b0 = h * h * t0 * (t0 * t0 - 1.0) / 6.0
    b1 = h * h * t1 * (t1 * t1 - 1.0) / 6.0
    return a0, a1, b0, b1


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Spline1D:
    """Natural cubic spline through ``(xs, ys)``; call with a traced scalar."""

    xs: jnp.ndarray
    ys: jnp.ndarray
    ms: jnp.ndarray  # second derivatives at the knots

    @classmethod
    def fit(cls, xs, ys) -> "Spline1D":
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if xs.ndim != 1 or xs.shape != ys.shape:
            raise ValueError(f"1-D knots/values shape mismatch: {xs.shape} vs {ys.shape}")
        if xs.shape[0] < 2:
            raise ValueError("need at least 2 knots")
        if not np.all(np.diff(xs) > 0):
            raise ValueError("knots must be strictly increasing")
        ms = _second_derivative_operator(xs) @ ys
        return cls(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ms))

    def __call__(self, x):
        x = jnp.asarray(x)
        if x.ndim > 0:
            return jax.vmap(self)(x.reshape(-1)).reshape(x.shape)
        i = _cell_index(self.xs, x)
        a0, a1, b0, b1 = _eval_weights(self.xs, i, x)
        return (
            a0 * self.ys[i] + a1 * self.ys[i + 1]
            + b0 * self.ms[i] + b1 * self.ms[i + 1]
        )

    def tree_flatten(self):
        return (self.xs, self.ys, self.ms), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Spline2D:
    """Tensor-product natural bicubic spline through ``Z[i, j] = f(xs[i], ys[j])``."""

    xs: jnp.ndarray
    ys: jnp.ndarray
    z: jnp.ndarray     # (nx, ny) values
    mx: jnp.ndarray    # d2/dx2
    my: jnp.ndarray    # d2/dy2
    mxy: jnp.ndarray   # d4/dx2dy2

    @classmethod
    def fit(cls, xs, ys, z) -> "Spline2D":
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        if z.shape != (xs.shape[0], ys.shape[0]):
            raise ValueError(
                f"value grid {z.shape} does not match knots "
                f"({xs.shape[0]}, {ys.shape[0]})"
            )
        if not (np.all(np.diff(xs) > 0) and np.all(np.diff(ys) > 0)):
            raise ValueError("knots must be strictly increasing")
        Sx = _second_derivative_operator(xs)
        Sy = _second_derivative_operator(ys)
        mx = Sx @ z
        my = z @ Sy.T
        mxy = Sx @ my
        return cls(*(jnp.asarray(a) for a in (xs, ys, z, mx, my, mxy)))

    def __call__(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if x.ndim > 0:
            return jax.vmap(self)(x.reshape(-1), y.reshape(-1)).reshape(x.shape)
        i = _cell_index(self.xs, x)
        j = _cell_index(self.ys, y)
        ax0, ax1, bx0, bx1 = _eval_weights(self.xs, i, x)
        ay0, ay1, by0, by1 = _eval_weights(self.ys, j, y)

        def corner(arr):
            return (arr[i, j], arr[i, j + 1], arr[i + 1, j], arr[i + 1, j + 1])

        def blend(arr, wx0, wx1, wy0, wy1):
            c00, c01, c10, c11 = corner(arr)
            return wx0 * (wy0 * c00 + wy1 * c01) + wx1 * (wy0 * c10 + wy1 * c11)

        return (
            blend(self.z, ax0, ax1, ay0, ay1)
            + blend(self.my, ax0, ax1, by0, by1)
            + blend(self.mx, bx0, bx1, ay0, ay1)
            + blend(self.mxy, bx0, bx1, by0, by1)
        )

    def tree_flatten(self):
        return (self.xs, self.ys, self.z, self.mx, self.my, self.mxy), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
