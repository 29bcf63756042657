"""Lane-parallel Pallas Cholesky/solve kernels vs numpy (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lpopc_tpu.ops.batched_linalg import lane_cho_solve, lane_cholesky


def _spd_batch(B, n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n)).astype(dtype)
    return A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("B,n", [(4, 8), (130, 16), (256, 32)])
def test_lane_cholesky_matches_numpy(B, n):
    K = _spd_batch(B, n)
    L = np.asarray(lane_cholesky(jnp.asarray(K)))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, atol=1e-9, rtol=1e-9)


def test_lane_cho_solve_matches_numpy():
    B, n = 64, 24
    K = _spd_batch(B, n, seed=1)
    rhs = np.random.default_rng(2).standard_normal((B, n))
    L = lane_cholesky(jnp.asarray(K))
    x = np.asarray(lane_cho_solve(L, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(K, rhs[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, atol=1e-8, rtol=1e-8)


def test_lane_kernels_f32():
    B, n = 32, 16
    K = _spd_batch(B, n, seed=3, dtype=np.float32)
    rhs = np.random.default_rng(4).standard_normal((B, n)).astype(np.float32)
    L = lane_cholesky(jnp.asarray(K))
    assert L.dtype == jnp.float32
    x = np.asarray(lane_cho_solve(L, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(K.astype(np.float64), rhs.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, atol=5e-3)
