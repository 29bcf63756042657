"""Recursive blocked batched Cholesky / triangular inverse for TPU.

Why this exists (measured, not guessed): the on-TPU profile of the batched
IPM (``scripts/exp_profile.py``) shows ~85% of every interior-point
iteration inside XLA's ``cholesky``/``triangular_solve`` lowerings — both are
column-at-a-time sequential ``while`` loops (~n steps of ~100 us each at
(512, 53, 53); each step re-streams the whole operand), which makes a
372 ms/iteration floor that is INDEPENDENT of dtype and batch-parallelism.
The reference never faces this because IPOPT+MUMPS factors one sparse matrix
on a CPU (``/root/reference/Lpopc/src/Core/LpNLPSolver.cpp``).

This module replaces both with **statically-unrolled recursive blocked
algorithms** whose primitive is the batched matmul:

  chol([[A11, .], [A21, A22]]) = [[L11, 0], [A21 L11^-T, chol(A22 - ...)]]
  inv([[L11, 0], [L21, L22]])  = [[L11^-1, 0], [-L22^-1 L21 L11^-1, L22^-1]]

Recursion depth is log2(n / LEAF); the leaf factorization is an unrolled
LEAF-step update on tiny (..., LEAF, LEAF) panels. Total full-matrix-scale
ops: O(log n) matmuls instead of O(n) sequential full-matrix passes, and no
``while``/``conditional`` ops at all — the whole factorization inlines into
the surrounding jit.

Accuracy: standard blocked Cholesky is backward-stable; equals
``jnp.linalg.cholesky`` to ~eps * cond. NaN behavior matches (non-PD pivots
produce NaN via sqrt of negative), which the IPM's factorization-divergence
inertia test relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LEAF = 8


def _chol_leaf(A):
    """Unrolled Cholesky of a (..., k, k) block, k <= LEAF (static)."""
    k = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(k):
        d = jnp.sqrt(A[..., j, j])
        col = A[..., :, j] / d[..., None]
        mask = (jnp.arange(k) >= j)
        col = jnp.where(mask, col, 0.0)
        L = L.at[..., :, j].set(col)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def _tri_inv_leaf(L):
    """Unrolled inverse of a lower-triangular (..., k, k) block."""
    k = L.shape[-1]
    eye = jnp.eye(k, dtype=L.dtype)
    X = jnp.zeros_like(L)
    # forward substitution, column-of-identity at a time (k static, tiny)
    for j in range(k):
        b = jnp.broadcast_to(eye[:, j], L.shape[:-2] + (k,))
        x = jnp.zeros_like(b)
        for i in range(j, k):
            s = b[..., i] - jnp.einsum("...k,...k->...", L[..., i, :i], x[..., :i]) \
                if i else b[..., i]
            x = x.at[..., i].set(s / L[..., i, i])
        X = X.at[..., :, j].set(x)
    return X


def blocked_cholesky(A):
    """Batched lower Cholesky of (..., n, n); static recursion, matmul-based."""
    n = A.shape[-1]
    if n <= LEAF:
        return _chol_leaf(A)
    h = n // 2
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11 = blocked_cholesky(A11)
    L11inv = blocked_tri_inv(L11)
    L21 = A21 @ jnp.swapaxes(L11inv, -1, -2)
    S22 = A22 - L21 @ jnp.swapaxes(L21, -1, -2)
    L22 = blocked_cholesky(S22)
    z = jnp.zeros(A.shape[:-2] + (h, n - h), A.dtype)
    top = jnp.concatenate([L11, z], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def blocked_tri_inv(L):
    """Batched inverse of lower-triangular (..., n, n); static recursion."""
    n = L.shape[-1]
    if n <= LEAF:
        return _tri_inv_leaf(L)
    h = n // 2
    L11 = L[..., :h, :h]
    L21 = L[..., h:, :h]
    L22 = L[..., h:, h:]
    X11 = blocked_tri_inv(L11)
    X22 = blocked_tri_inv(L22)
    X21 = -(X22 @ (L21 @ X11))
    z = jnp.zeros(L.shape[:-2] + (h, n - h), L.dtype)
    top = jnp.concatenate([X11, z], axis=-1)
    bot = jnp.concatenate([X21, X22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_and_inverse(K):
    """(L, L^-1) of a batched SPD K — the IPM apply-mode factorization pair."""
    L = blocked_cholesky(K)
    return L, blocked_tri_inv(L)
