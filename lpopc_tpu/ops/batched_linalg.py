"""Lane-parallel batched dense linear algebra (Pallas TPU kernels).

The IPM's per-instance KKT matrices are small (n ~ 30-700); a sweep solves
hundreds to thousands of them per iteration. The TPU-native way to batch
*small* factorizations is to put the **batch on the lane dimension**: store
the matrices as (n, n, B) so every scalar step of the factorization becomes a
128-wide vector operation — one lane per matrix, the systolic analog of GPU
per-thread batched LAPACK. (XLA's batched Cholesky parallelizes well only for
large blocks; tiny matrices leave lanes idle.)

Kernels:
* ``lane_cholesky``  — right-looking Cholesky, one column step per
  ``fori_loop`` iteration, trailing update as a full masked outer product
  (VPU, lane-parallel across the batch).
* ``lane_cho_solve`` — forward + backward substitution in the same layout.

``pallas_call`` runs with ``interpret=True`` off-TPU so the kernels are
testable on CPU. Batch is padded to a multiple of 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chol_kernel(k_ref, l_ref):
    # Mosaic-friendly formulation: NO dynamic ref indexing — each column step
    # extracts/writes column j via full-tensor masked selects and masked-sum
    # reductions (all shapes static). Also strict dtype hygiene (explicit
    # casts) and int32 loop counters: weak-f64 literals / int64 indices under
    # jax_enable_x64 break Mosaic's convert-element-type lowering.
    n = k_ref.shape[0]
    dt = k_ref.dtype
    zero = jnp.zeros((), dt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)[:, :, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)[:, :, None]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    l_ref[:] = k_ref[:]

    def col_step(j, carry):
        L = l_ref[:]                                           # (n, n, B)
        # column j (masked row-sum over the col axis) and its pivot
        colj_raw = jnp.sum(jnp.where(cols == j, L, zero), axis=1)      # (n, B)
        piv = jnp.sum(jnp.where(row1 == j, colj_raw, zero), axis=0)    # (B,)
        colj = jnp.where(row1 >= j, colj_raw / jnp.sqrt(piv)[None, :], zero)
        # write column j, then apply the trailing rank-1 update
        L = jnp.where(cols == j, colj[:, None, :], L)
        outer = colj[:, None, :] * colj[None, :, :]
        L = L - jnp.where((rows > j) & (cols > j), outer, zero)
        l_ref[:] = L
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), col_step,
                      jnp.zeros((), jnp.int32))
    l_ref[:] = jnp.where(rows >= cols, l_ref[:], zero)


def _solve_kernel(l_ref, b_ref, x_ref, y_scratch):
    # Same static masked-op style as _chol_kernel (no dynamic ref indexing).
    n = l_ref.shape[0]
    dt = l_ref.dtype
    zero = jnp.zeros((), dt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)[:, :, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)[:, :, None]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    y_scratch[:] = jnp.zeros_like(y_scratch)

    def row_of(M, j):
        return jnp.sum(jnp.where(rows == j, M, zero), axis=0)  # (n, B): row j

    def diag_at(j):
        return jnp.sum(jnp.where((rows == j) & (cols == j), l_ref[:], zero),
                       axis=(0, 1))                            # (B,)

    def fwd(j, carry):
        lrow = row_of(l_ref[:], j)                             # (n, B) = L[j, :, :]
        acc = jnp.sum(jnp.where(row1 < j, lrow * y_scratch[:], zero), axis=0)
        bj = jnp.sum(jnp.where(row1 == j, b_ref[:], zero), axis=0)
        val = (bj - acc) / diag_at(j)
        y_scratch[:] = jnp.where(row1 == j, val[None, :], y_scratch[:])
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), fwd, jnp.zeros((), jnp.int32))
    x_ref[:] = jnp.zeros_like(x_ref)

    def bwd(jj, carry):
        j = jnp.int32(n - 1) - jj
        lcol = jnp.sum(jnp.where(cols == j, l_ref[:], zero), axis=1)  # (n, B)
        acc = jnp.sum(jnp.where(row1 > j, lcol * x_ref[:], zero), axis=0)
        yj = jnp.sum(jnp.where(row1 == j, y_scratch[:], zero), axis=0)
        val = (yj - acc) / diag_at(j)
        x_ref[:] = jnp.where(row1 == j, val[None, :], x_ref[:])
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), bwd, jnp.zeros((), jnp.int32))


def _pad_lanes(B: int) -> int:
    return ((B + LANES - 1) // LANES) * LANES


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_cholesky(K: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """Cholesky of a batch of SPD matrices, batch on lanes.

    K: (B, n, n) -> L: (B, n, n) lower-triangular.
    """
    interp = _interpret() if interpret is None else interpret
    B, n, _ = K.shape
    Bp = _pad_lanes(B)
    Kt = jnp.moveaxis(K, 0, -1)                               # (n, n, B)
    if Bp != B:
        pad = jnp.zeros((n, n, Bp - B), K.dtype) + jnp.eye(n, dtype=K.dtype)[:, :, None]
        Kt = jnp.concatenate([Kt, pad], axis=-1)
    grid = (Bp // LANES,)
    Lt = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), K.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interp,
    )(Kt)
    return jnp.moveaxis(Lt[:, :, :B], -1, 0)


def smart_cholesky_and_solve():
    """(chol, solve) pair that transparently switches to the lane-parallel
    Pallas kernels when used under ``vmap`` (i.e. inside a batched IPM).

    Built on ``jax.custom_batching.custom_vmap``: the unbatched rule is XLA's
    native Cholesky/solve; the batched rule dispatches the whole batch to the
    lane kernels (batch on the 128-wide lane dimension).
    """
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def chol(K):
        return jnp.linalg.cholesky(K)

    @chol.def_vmap
    def _chol_vmap(axis_size, in_batched, K):
        (kb,) = in_batched
        if not kb:
            return jnp.linalg.cholesky(K), False
        return lane_cholesky(K), True

    @custom_vmap
    def solve(L, b):
        return jax.scipy.linalg.cho_solve((L, True), b)

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, L, b):
        lb, bb = in_batched
        if not (lb and bb):
            L2 = L if lb else jnp.broadcast_to(L, (axis_size,) + L.shape)
            b2 = b if bb else jnp.broadcast_to(b, (axis_size,) + b.shape)
        else:
            L2, b2 = L, b
        return lane_cho_solve(L2, b2), True

    return chol, solve


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_cho_solve(L: jnp.ndarray, b: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """Solve L Lᵀ x = b for a batch, batch on lanes. L: (B, n, n), b: (B, n)."""
    interp = _interpret() if interpret is None else interpret
    B, n, _ = L.shape
    Bp = _pad_lanes(B)
    Lt = jnp.moveaxis(L, 0, -1)
    bt = jnp.moveaxis(b, 0, -1)                               # (n, B)
    if Bp != B:
        Lt = jnp.concatenate(
            [Lt, jnp.zeros((n, n, Bp - B), L.dtype)
             + jnp.eye(n, dtype=L.dtype)[:, :, None]], axis=-1)
        bt = jnp.concatenate([bt, jnp.zeros((n, Bp - B), b.dtype)], axis=-1)
    grid = (Bp // LANES,)
    xt = pl.pallas_call(
        _solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, Bp), b.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, LANES), b.dtype)],
        interpret=interp,
    )(Lt, bt)
    return jnp.moveaxis(xt[:, :B], -1, 0)
