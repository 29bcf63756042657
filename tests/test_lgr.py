"""Collocation-layer tests: LGR nodes/weights, D/A matrices, composite ops.

Oracle strategy mirrors SURVEY.md §4: closed-form low-degree values, quadrature
exactness on polynomials (degree ≤ 2N-2), differentiation exactness on
polynomials (degree ≤ N), and inverse/identity relations between D and A.
"""

import numpy as np
import pytest

from lpopc_tpu.ops import lgr
from lpopc_tpu.ops.interp import (
    barycentric_interpolate,
    cubic_spline_interpolate,
    interpolation_matrix,
)


def test_lgr_n1():
    tau, w = lgr.lgr_nodes_weights(1)
    np.testing.assert_allclose(tau, [-1.0])
    np.testing.assert_allclose(w, [2.0])


def test_lgr_n2_closed_form():
    tau, w = lgr.lgr_nodes_weights(2)
    np.testing.assert_allclose(tau, [-1.0, 1.0 / 3.0], atol=1e-14)
    np.testing.assert_allclose(w, [0.5, 1.5], atol=1e-14)


def test_lgr_n3_closed_form():
    # Roots of P2 + P3 = 0 on (-1, 1): (1 ∓ sqrt(6)) / 5, plus -1.
    tau, w = lgr.lgr_nodes_weights(3)
    expected = np.sort([-1.0, (1 - np.sqrt(6)) / 5, (1 + np.sqrt(6)) / 5])
    np.testing.assert_allclose(tau, expected, atol=1e-14)
    np.testing.assert_allclose(w[0], 2.0 / 9.0, atol=1e-14)
    np.testing.assert_allclose(np.sum(w), 2.0, atol=1e-14)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 13, 16, 25, 40])
def test_quadrature_exactness(n):
    tau, w = lgr.lgr_nodes_weights(n)
    assert tau[0] == -1.0
    assert np.all(np.diff(tau) > 0)
    assert tau[-1] < 1.0
    for deg in range(0, 2 * n - 1):
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        approx = np.sum(w * tau**deg)
        np.testing.assert_allclose(approx, exact, atol=5e-13, err_msg=f"deg={deg}")


@pytest.mark.parametrize("n", [2, 3, 5, 8, 16])
def test_differentiation_matrix_exact_on_polynomials(n):
    tau, w, D, A = lgr.segment_matrices(n)
    support = np.concatenate([tau, [1.0]])
    for deg in range(0, n + 1):
        vals = support**deg
        dvals = deg * tau ** max(deg - 1, 0) if deg > 0 else np.zeros_like(tau)
        np.testing.assert_allclose(D @ vals, dvals, atol=1e-10, err_msg=f"deg={deg}")


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_integration_matrix_inverse(n):
    _, _, D, A = lgr.segment_matrices(n)
    np.testing.assert_allclose(A @ D[:, 1:], np.eye(n), atol=1e-10)


def test_composite_ops_uniform():
    degrees, fractions = lgr.uniform_mesh(4, 5)
    ops = lgr.make_segment_ops(degrees, fractions)
    assert ops.num_collocation == 20
    assert ops.tau_state.shape == (21,)
    np.testing.assert_allclose(np.sum(ops.w), 2.0, atol=1e-13)
    # Composite D differentiates polynomials across all segments.
    for deg in range(0, 6):
        vals = ops.tau_state**deg
        dvals = deg * ops.tau ** max(deg - 1, 0) if deg > 0 else np.zeros_like(ops.tau)
        np.testing.assert_allclose(ops.D @ vals, dvals, atol=1e-9)
    # Quadrature over the composite grid.
    np.testing.assert_allclose(np.sum(ops.w * ops.tau**4), 2.0 / 5.0, atol=1e-12)


def test_composite_ops_nonuniform():
    degrees = (3, 6, 4)
    fractions = (-1.0, -0.7, 0.2, 1.0)
    ops = lgr.make_segment_ops(degrees, fractions)
    assert ops.num_collocation == 13
    assert ops.seg_starts == (0, 3, 9)
    # Each segment's first collocation point is the segment's left endpoint.
    np.testing.assert_allclose(
        [ops.tau[s] for s in ops.seg_starts], fractions[:-1], atol=1e-14
    )
    for deg in range(0, 4):
        vals = ops.tau_state**deg
        dvals = deg * ops.tau ** max(deg - 1, 0) if deg > 0 else np.zeros_like(ops.tau)
        np.testing.assert_allclose(ops.D @ vals, dvals, atol=1e-9)


def test_integration_matrix_solves_ode():
    # A is the inverse of D[:, 1:]; use it to integrate dx/dτ = 1 over one
    # segment in the phase domain: X[1:] = x0 + A_phase @ f.
    degrees = (5,)
    fractions = (-1.0, 1.0)
    ops = lgr.make_segment_ops(degrees, fractions)
    A = ops.integration_matrix(0)
    x0 = 2.0
    f = np.ones(5)
    x_tail = x0 + A @ (f - 0.0)
    np.testing.assert_allclose(
        x_tail, 2.0 + (ops.tau_state[1:] - (-1.0)), atol=1e-10
    )


def test_interpolation_matrix_exact_and_polynomial():
    tau, _ = lgr.lgr_nodes_weights(6)
    support = np.concatenate([tau, [1.0]])
    targets = np.array([-1.0, -0.3, 0.123, 0.9, 1.0])
    M = interpolation_matrix(support, targets)
    vals = support**5 - 2 * support**2 + 1
    expect = targets**5 - 2 * targets**2 + 1
    np.testing.assert_allclose(M @ vals, expect, atol=1e-11)
    # Exact pass-through when target == support point.
    np.testing.assert_allclose(M[0], np.eye(7)[0], atol=1e-12)
    np.testing.assert_allclose(M[-1], np.eye(7)[6], atol=1e-12)


def test_barycentric_interpolate_matrix_valued():
    x = np.linspace(-1, 1, 7)
    vals = np.stack([x**2, x**3], axis=1)
    t = np.array([-0.5, 0.25])
    out = barycentric_interpolate(x, vals, t)
    np.testing.assert_allclose(out[:, 0], t**2, atol=1e-12)
    np.testing.assert_allclose(out[:, 1], t**3, atol=1e-12)


def test_cubic_spline_reproduces_cubic():
    x = np.linspace(0.0, 2.0, 30)
    y = x**3 - x
    t = np.linspace(0.0, 2.0, 57)
    out = cubic_spline_interpolate(x, y, t)
    # Natural end conditions leave O(h^2) error near the boundary for a cubic
    # whose second derivative is nonzero at the ends.
    np.testing.assert_allclose(out, t**3 - t, atol=5e-3)
    # Exact at the knots regardless of density.
    np.testing.assert_allclose(
        cubic_spline_interpolate(x, y, x), y, atol=1e-12
    )


def test_cubic_spline_multicolumn_and_edge_cases():
    x = np.array([0.0, 1.0])
    y = np.array([[0.0, 1.0], [2.0, 3.0]])
    out = cubic_spline_interpolate(x, y, np.array([0.5]))
    np.testing.assert_allclose(out, [[1.0, 2.0]])
    out1 = cubic_spline_interpolate(np.array([1.0]), np.array([[5.0]]), np.array([0.0, 2.0]))
    np.testing.assert_allclose(out1, [[5.0], [5.0]])
