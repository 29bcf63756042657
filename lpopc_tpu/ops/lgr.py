"""Legendre–Gauss–Radau (LGR) collocation operators.

Capability parity with the reference's ``RPMGenerator``
(``/root/reference/Lpopc/src/Core/RPMGenerator.cpp:56-295``): LGR nodes and
quadrature weights, the barycentric differentiation matrix, the per-segment
integration matrix ``A = inv(D[:, 1:])``, the "unity" matrix ``B``, and the
composite (multi-segment) phase operators — all re-derived from scratch.

TPU-first design notes
----------------------
* Nodes/weights/matrices are computed **on host** in extended precision (the
  native ``long double`` C++ backend in ``lpopc_tpu/native/lgr_native.cpp``,
  with a ``numpy.longdouble`` fallback) and memoized per degree, exactly
  because they are solve-time constants: they enter jitted computations as
  literal arrays, so their construction cost and precision never touch the
  device.
* Composite phase operators are built as **dense** matrices. The reference
  keeps a global sparse triplet matrix (``RPMGenerator.cpp:132-181``); on TPU
  a dense ``(N, N+1)`` differentiation matrix turns the defect evaluation into
  a single MXU matmul, which beats any sparse representation for the mesh
  sizes this problem class produces (N ≲ a few thousand).
* Per-segment blocks are also exposed (``SegmentOps.blocks``) so that solvers
  exploiting the block-bidiagonal KKT structure can batch uniform-degree
  segments with ``vmap``.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import threading
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

_NATIVE_LOCK = threading.Lock()
_NATIVE_LIB = None
_NATIVE_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def _load_native():
    """Build (once) and load the long-double LGR backend; None on failure."""
    global _NATIVE_LIB, _NATIVE_TRIED
    with _NATIVE_LOCK:
        if _NATIVE_TRIED:
            return _NATIVE_LIB
        _NATIVE_TRIED = True
        src = os.path.join(_native_dir(), "lgr_native.cpp")
        so = os.path.join(_native_dir(), "liblgr_native.so")
        try:
            if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(so)
            lib.lgr_nodes_weights.restype = ctypes.c_int
            lib.lgr_nodes_weights.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.diff_matrix.restype = ctypes.c_int
            lib.diff_matrix.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            _NATIVE_LIB = lib
        except Exception:  # pragma: no cover - fallback path
            _NATIVE_LIB = None
        return _NATIVE_LIB


def _legendre_pair(n: int, x):
    """Return (P_{n-1}(x), P_n(x)) by the three-term recurrence."""
    p0 = np.ones_like(x)
    p1 = np.asarray(x).copy()
    if n == 0:
        return np.zeros_like(x), p0
    if n == 1:
        return p0, p1
    for k in range(2, n + 1):
        p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
    return p0, p1


def _lgr_numpy(n: int):
    """LGR nodes/weights in numpy.longdouble (fallback when g++ unavailable).

    Nodes: -1 plus the roots of P_{n-1} + P_n. Initial guesses come from the
    Gauss–Radau-modified Jacobi matrix (Golub–Welsch), polished by Newton in
    extended precision.
    """
    if n == 1:
        return np.array([-1.0]), np.array([2.0])
    k = np.arange(1, n, dtype=np.float64)
    beta = k**2 / (4 * k**2 - 1)
    # Golub's Gauss–Radau modification of the last diagonal entry for a = -1.
    a = np.longdouble(-1.0)
    q0, qm1 = np.longdouble(1.0), np.longdouble(0.0)
    pn2 = pn1 = np.longdouble(0.0)
    for j in range(n):
        if j == n - 2:
            pn2 = q0
        if j == n - 1:
            pn1 = q0
        bj = np.longdouble(0.0) if j == 0 else np.longdouble(j * j) / (4 * j * j - 1)
        q0, qm1 = a * q0 - bj * qm1, q0
    alpha = np.zeros(n)
    alpha[-1] = float(a - np.longdouble(beta[-1]) * pn2 / pn1)
    J = np.diag(alpha) + np.diag(np.sqrt(beta), 1) + np.diag(np.sqrt(beta), -1)
    x = np.sort(np.linalg.eigvalsh(J)).astype(np.longdouble)
    x[0] = np.longdouble(-1.0)
    # Newton polish of interior nodes on q(x) = P_{n-1}(x) + P_n(x).
    xi = x[1:]
    for _ in range(8):
        pnm1, pn = _legendre_pair(n, xi)
        pnm2, pnm1b = _legendre_pair(n - 1, xi)
        denom = xi * xi - 1.0
        dq = n * (xi * pn - pnm1) / denom + (n - 1) * (xi * pnm1b - pnm2) / denom
        step = (pnm1 + pn) / dq
        xi = xi - step
        if np.max(np.abs(step)) < np.longdouble(1e-19):
            break
    x[1:] = xi
    w = np.empty(n, dtype=np.longdouble)
    w[0] = np.longdouble(2.0) / (n * n)
    pnm1, _ = _legendre_pair(n, x[1:])
    w[1:] = (1.0 - x[1:]) / (n * n * pnm1 * pnm1)
    return x.astype(np.float64), w.astype(np.float64)


@functools.lru_cache(maxsize=None)
def lgr_nodes_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """The n LGR collocation points on [-1, 1) (τ₁ = -1) and quadrature weights.

    Quadrature is exact for polynomials of degree ≤ 2n-2. Memoized per degree,
    mirroring the reference's static caches (``RPMGenerator.cpp:17-41``).
    """
    if n < 1:
        raise ValueError(f"LGR degree must be >= 1, got {n}")
    lib = _load_native()
    if lib is not None:
        nodes = np.empty(n, dtype=np.float64)
        weights = np.empty(n, dtype=np.float64)
        rc = lib.lgr_nodes_weights(
            n,
            nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc == 0:
            nodes.setflags(write=False)
            weights.setflags(write=False)
            return nodes, weights
    nodes, weights = _lgr_numpy(n)
    nodes.setflags(write=False)
    weights.setflags(write=False)
    return nodes, weights


def barycentric_weights(pts: np.ndarray) -> np.ndarray:
    """Barycentric interpolation weights for arbitrary support points."""
    pts = np.asarray(pts, dtype=np.longdouble)
    diff = pts[:, None] - pts[None, :]
    np.fill_diagonal(diff, 1.0)
    return (1.0 / np.prod(diff, axis=1)).astype(np.float64)


def differentiation_matrix_full(pts: np.ndarray) -> np.ndarray:
    """Dense (m, m) differentiation matrix on arbitrary support points.

    ``D[i, j] = dL_j/dx (x_i)`` via the barycentric formula, with the diagonal
    from the negative-sum trick (cf. the reference's ``CollocD``,
    ``RPMGenerator.cpp:107-130``, re-derived here).
    """
    pts = np.asarray(pts, dtype=np.float64)
    m = pts.shape[0]
    lib = _load_native()
    if lib is not None:
        D = np.empty((m, m), dtype=np.float64)
        rc = lib.diff_matrix(
            m,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            D.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc == 0:
            return D
    ptsl = pts.astype(np.longdouble)
    bw = barycentric_weights(pts).astype(np.longdouble)
    diff = ptsl[:, None] - ptsl[None, :]
    np.fill_diagonal(diff, np.inf)
    D = (bw[None, :] / bw[:, None]) / diff
    np.fill_diagonal(D, 0.0)
    np.fill_diagonal(D, -np.sum(D, axis=1))
    return D.astype(np.float64)


@functools.lru_cache(maxsize=None)
def segment_matrices(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-segment operators on the local domain [-1, 1].

    Returns ``(tau, w, D, A)`` where ``tau`` are the n LGR points, ``w`` the
    weights, ``D`` the (n, n+1) differentiation matrix on the n+1 support
    points (LGR nodes plus the right endpoint +1) restricted to collocation
    rows, and ``A = inv(D[:, 1:])`` the (n, n) integration matrix used by the
    error estimator (reference: ``RPMGenerator.cpp:85, 200-251``).
    """
    tau, w = lgr_nodes_weights(n)
    support = np.concatenate([tau, [1.0]])
    Dfull = differentiation_matrix_full(support)
    D = Dfull[:n, :]
    A = np.linalg.inv(D[:, 1:].astype(np.float64))
    for arr in (tau, w, D, A):
        arr.setflags(write=False)
    return tau, w, D, A


@dataclass(frozen=True)
class SegmentOps:
    """Composite collocation operators for one phase on the domain [-1, 1].

    Attributes
    ----------
    degrees: per-segment collocation point counts (static python tuple).
    fractions: K+1 mesh points on [-1, 1] (``fractions[0] = -1``,
        ``fractions[-1] = +1``), matching the reference's per-phase
        ``meshpoints``.
    tau: (N,) all collocation points mapped into the phase domain.
    tau_state: (N+1,) discretization (state) points = tau plus +1.
    w: (N,) quadrature weights scaled to the phase domain (sum = 2).
    D: (N, N+1) composite differentiation matrix in phase-domain coordinates,
        i.e. ``D @ X ≈ dX/dτ`` at collocation points. Dense and block
        bi-diagonal (one overlap column per segment boundary).
    seg_starts: collocation-row offset of each segment.
    """

    degrees: tuple[int, ...]
    fractions: tuple[float, ...]
    tau: np.ndarray = field(repr=False)
    tau_state: np.ndarray = field(repr=False)
    w: np.ndarray = field(repr=False)
    D: np.ndarray = field(repr=False)
    seg_starts: tuple[int, ...]

    @property
    def num_collocation(self) -> int:
        return int(self.tau.shape[0])

    @property
    def num_segments(self) -> int:
        return len(self.degrees)

    def segment_slice(self, k: int) -> slice:
        return slice(self.seg_starts[k], self.seg_starts[k] + self.degrees[k])

    def integration_matrix(self, k: int) -> np.ndarray:
        """Phase-domain integration matrix of segment k (for error estimation)."""
        _, _, _, A = segment_matrices(self.degrees[k])
        half_width = (self.fractions[k + 1] - self.fractions[k]) / 2.0
        return A * half_width


@functools.lru_cache(maxsize=None)
def make_segment_ops(
    degrees: tuple[int, ...], fractions: tuple[float, ...]
) -> SegmentOps:
    """Build composite phase operators for a mesh (memoized on the mesh key)."""
    degrees = tuple(int(d) for d in degrees)
    fractions = tuple(float(f) for f in fractions)
    if len(fractions) != len(degrees) + 1:
        raise ValueError("need len(fractions) == len(degrees) + 1")
    if abs(fractions[0] + 1.0) > 1e-12 or abs(fractions[-1] - 1.0) > 1e-12:
        raise ValueError("mesh fractions must span [-1, 1]")
    if any(b <= a for a, b in zip(fractions[:-1], fractions[1:])):
        raise ValueError("mesh fractions must be strictly increasing")
    N = sum(degrees)
    D = np.zeros((N, N + 1), dtype=np.float64)
    tau = np.empty(N, dtype=np.float64)
    w = np.empty(N, dtype=np.float64)
    seg_starts = []
    off = 0
    for k, nk in enumerate(degrees):
        seg_starts.append(off)
        a, b = fractions[k], fractions[k + 1]
        half = (b - a) / 2.0
        tau_loc, w_loc, D_loc, _ = segment_matrices(nk)
        tau[off : off + nk] = a + (tau_loc + 1.0) * half
        w[off : off + nk] = w_loc * half
        # local -> phase-domain derivative scaling: d/dτ = (1/half) d/dξ
        D[off : off + nk, off : off + nk + 1] = D_loc / half
        off += nk
    tau_state = np.concatenate([tau, [1.0]])
    for arr in (tau, tau_state, w, D):
        arr.setflags(write=False)
    return SegmentOps(
        degrees=degrees,
        fractions=fractions,
        tau=tau,
        tau_state=tau_state,
        w=w,
        D=D,
        seg_starts=tuple(seg_starts),
    )


@functools.lru_cache(maxsize=None)
def runtime_mesh_patterns(degrees: tuple[int, ...]):
    """Static patterns for materializing phase operators from RUNTIME fractions.

    For a fixed per-segment degree tuple, every collocation operator is a
    simple rescaling of per-segment constants by the segment half-widths:
    ``tau = a_s + (tau_loc+1)·h_s``, ``w = w_loc·h_s``, ``D = D_loc/h_s``
    (``make_segment_ops`` above bakes the same identities into constants).
    Exposing the unscaled patterns lets a jitted solve take the mesh
    *fractions* as a traced argument — one compiled solver serves every mesh
    with the same degree signature, which is what makes the hp-refinement
    loop's shape-bucketing (core/solve.py) recompile-free.

    Returns ``(tau_pat, w_pat, P, row_seg)``: per-collocation-row patterns
    ``tau_loc + 1`` and ``w_loc``, the unscaled block-diagonal ``D`` pattern
    ``P`` (N, N+1), and the row→segment index map.
    """
    degrees = tuple(int(d) for d in degrees)
    N = sum(degrees)
    P = np.zeros((N, N + 1))
    tau_pat = np.empty(N)
    w_pat = np.empty(N)
    row_seg = np.empty(N, dtype=np.int32)
    off = 0
    for k, nk in enumerate(degrees):
        tau_loc, w_loc, D_loc, _ = segment_matrices(nk)
        P[off : off + nk, off : off + nk + 1] = D_loc
        tau_pat[off : off + nk] = tau_loc + 1.0
        w_pat[off : off + nk] = w_loc
        row_seg[off : off + nk] = k
        off += nk
    for arr in (tau_pat, w_pat, P, row_seg):
        arr.setflags(write=False)
    return tau_pat, w_pat, P, row_seg


def materialize_phase_ops(degrees: tuple[int, ...], fracs):
    """(tau, tau_state, w, D) as jax arrays from runtime fractions ``fracs``
    ((S+1,) array spanning [-1, 1]). Trace-safe; used inside jit."""
    import jax.numpy as jnp

    tau_pat, w_pat, P, row_seg = runtime_mesh_patterns(tuple(degrees))
    fracs = jnp.asarray(fracs)
    half = (fracs[1:] - fracs[:-1]) / 2.0
    hs = half[row_seg]
    a_s = fracs[:-1][row_seg]
    tau = a_s + jnp.asarray(tau_pat, fracs.dtype) * hs
    w = jnp.asarray(w_pat, fracs.dtype) * hs
    D = jnp.asarray(P, fracs.dtype) / hs[:, None]
    tau_state = jnp.concatenate([tau, jnp.ones((1,), fracs.dtype)])
    return tau, tau_state, w, D


def uniform_fractions(num_segments: int) -> tuple[float, ...]:
    """K+1 equally spaced mesh points spanning [-1, 1]."""
    return tuple(np.linspace(-1.0, 1.0, num_segments + 1).tolist())


def uniform_mesh(num_segments: int, degree: int) -> tuple[tuple[int, ...], tuple[float, ...]]:
    """Convenience: uniform mesh with equal segment widths and degrees."""
    return (degree,) * num_segments, uniform_fractions(num_segments)
