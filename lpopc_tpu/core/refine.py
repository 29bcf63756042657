"""Discretization-error estimation and hp-adaptive mesh refinement.

Error estimator (reference ``SolutionErrorChecker::CheckSolutionDiffError``,
``/root/reference/Lpopc/src/Core/LpSolutionError.cpp:112-169``): per segment,
interpolate the converged state/control to a grid with one extra LGR point,
evaluate the dynamics there, integrate with the fine integration matrix
``A = inv(D[:, 1:])``, and take the max relative mismatch
``|X_integrated - X_interpolated| / (1 + max_t |x_i(t)|)``.

"ph" strategy (Patterson–Hager–Rao; reference ``LpPhMeshRefineAlg.cpp:78-99``):
segments with error above tolerance either raise their degree by
``P = ceil(log(e/tol) / log(N))`` (if ``N + P <= Nmax``) or split into
``max(ceil((N+P)/Nmin), 2)`` equal subintervals of degree ``Nmin``.

"hp-Liu" strategy (Liu–Hager–Rao 2015; reference ``LpLiuHpMeshRefineAlg.cpp``):
adds a smoothness test (curvature ratio between meshes) deciding p- vs
h-refinement, degree *reduction* on converged smooth segments via the decay of
Legendre coefficients, and merging of adjacent satisfied segments.
Implemented in :mod:`.refine_liu`.

Everything here is host-side numpy/python — mesh decisions are control logic
between device solves, exactly where the reference keeps them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import interpolation_matrix
from ..ops.lgr import lgr_nodes_weights, segment_matrices
from .postprocess import PhaseSolution, Solution
from .problem import Problem


def segment_errors(ph, psol: PhaseSolution) -> np.ndarray:
    """Per-segment max relative discretization error for one phase."""
    degrees = psol.mesh_degrees
    fractions = psol.mesh_fractions
    t0, tf = psol.t0, psol.tf
    X = psol.x
    U = psol.u
    tau_state = 2.0 * (psol.t_state - t0) / max(tf - t0, 1e-300) - 1.0
    tau_col = 2.0 * (psol.t_col - t0) / max(tf - t0, 1e-300) - 1.0
    x_scale = 1.0 + np.max(np.abs(X), axis=0)  # (nx,)
    errs = np.zeros(len(degrees))
    off = 0
    for k, nk in enumerate(degrees):
        a, b = fractions[k], fractions[k + 1]
        half = (b - a) / 2.0
        nf = nk + 1
        tau_f, _ = lgr_nodes_weights(nf)
        tau_f_phase = a + (tau_f + 1.0) * half
        tau_f_state = np.concatenate([tau_f_phase, [b]])
        seg_state = tau_state[off : off + nk + 1]
        seg_col = tau_col[off : off + nk]
        Xseg = X[off : off + nk + 1]
        Useg = U[off : off + nk]
        Xf = interpolation_matrix(seg_state, tau_f_phase) @ Xseg
        if ph.nu > 0:
            Uf = interpolation_matrix(seg_col, tau_f_phase) @ Useg
        else:
            Uf = np.zeros((nf, 0))
        t_f = (tau_f_phase + 1.0) * (tf - t0) / 2.0 + t0
        F = np.asarray(
            jax.vmap(ph.dynamics, in_axes=(0, 0, 0, None))(
                jnp.asarray(Xf), jnp.asarray(Uf), jnp.asarray(t_f), jnp.asarray(psol.q)
            )
        ).reshape(nf, ph.nx)
        _, _, _, A = segment_matrices(nf)
        A_phase = A * half
        X_int = Xseg[0][None, :] + (tf - t0) / 2.0 * (A_phase @ F)
        X_ref = interpolation_matrix(seg_state, tau_f_state[1:]) @ Xseg
        errs[k] = np.max(np.abs(X_int - X_ref) / x_scale[None, :]) if ph.nx else 0.0
        off += nk
    return errs


def estimate_errors(problem: Problem, sol: Solution) -> list:
    return [
        segment_errors(ph, psol) for ph, psol in zip(problem.phases, sol.phases)
    ]


def segment_path_violations(ph, psol: PhaseSolution) -> np.ndarray:
    """Per-segment max INTER-NODE constraint violation at the fine check
    points: path-function rows against their bounds plus interior state
    bounds against the interpolated state.

    The reference explicitly does NOT measure path-constraint error
    (``doc/LpopcDoc.tex:1139`` — constraints hold only at collocation
    points, excursions between nodes are invisible). This estimator closes
    that observability gap: it reuses the same one-extra-LGR-point fine
    grid as :func:`segment_errors` and reports the max bound violation,
    normalized by ``1 + |bound|`` (relative, like the state error).
    Measurement only — refinement decisions remain reference-parity
    (state-error driven).
    """
    degrees = psol.mesh_degrees
    fractions = psol.mesh_fractions
    t0, tf = psol.t0, psol.tf
    X, U = psol.x, psol.u
    tau_state = 2.0 * (psol.t_state - t0) / max(tf - t0, 1e-300) - 1.0
    tau_col = 2.0 * (psol.t_col - t0) / max(tf - t0, 1e-300) - 1.0
    x_lo = np.asarray(ph.x_bounds[0], float).reshape(-1)
    x_hi = np.asarray(ph.x_bounds[1], float).reshape(-1)
    x_norm = 1.0 + np.minimum(np.abs(x_lo), np.abs(x_hi))
    x_norm = np.where(np.isfinite(x_norm), x_norm, 1.0)
    if ph.npath:
        p_lo = np.asarray(ph.path_bounds[0], float).reshape(-1)
        p_hi = np.asarray(ph.path_bounds[1], float).reshape(-1)
        p_norm = 1.0 + np.minimum(np.abs(p_lo), np.abs(p_hi))
        p_norm = np.where(np.isfinite(p_norm), p_norm, 1.0)
    viols = np.zeros(len(degrees))
    off = 0
    for k, nk in enumerate(degrees):
        a, b = fractions[k], fractions[k + 1]
        half = (b - a) / 2.0
        nf = nk + 1
        tau_f, _ = lgr_nodes_weights(nf)
        tau_f_phase = a + (tau_f + 1.0) * half
        seg_state = tau_state[off : off + nk + 1]
        seg_col = tau_col[off : off + nk]
        Xf = interpolation_matrix(seg_state, tau_f_phase) @ X[off : off + nk + 1]
        if ph.nu > 0:
            Uf = interpolation_matrix(seg_col, tau_f_phase) @ U[off : off + nk]
        else:
            Uf = np.zeros((nf, 0))
        v = 0.0
        with np.errstate(invalid="ignore"):
            lo_v = (x_lo[None, :] - Xf) / x_norm[None, :]
            hi_v = (Xf - x_hi[None, :]) / x_norm[None, :]
        for arr in (lo_v, hi_v):
            arr = arr[np.isfinite(arr)]
            if arr.size:
                v = max(v, float(np.max(arr)))
        if ph.npath:
            t_f = (tau_f_phase + 1.0) * (tf - t0) / 2.0 + t0
            C = np.asarray(
                jax.vmap(ph.path, in_axes=(0, 0, 0, None))(
                    jnp.asarray(Xf), jnp.asarray(Uf), jnp.asarray(t_f),
                    jnp.asarray(psol.q),
                )
            ).reshape(nf, ph.npath)
            with np.errstate(invalid="ignore"):
                lo_c = (p_lo[None, :] - C) / p_norm[None, :]
                hi_c = (C - p_hi[None, :]) / p_norm[None, :]
            for arr in (lo_c, hi_c):
                arr = arr[np.isfinite(arr)]
                if arr.size:
                    v = max(v, float(np.max(arr)))
        viols[k] = max(v, 0.0)
        off += nk
    return viols


def estimate_path_violations(problem: Problem, sol: Solution) -> list:
    return [
        segment_path_violations(ph, psol)
        for ph, psol in zip(problem.phases, sol.phases)
    ]


#: degree buckets for shape-bucketed meshes (recompile-free hp refinement).
#: Deliberately coarse: every distinct (bucket degree, segment count)
#: signature costs one XLA compile (60-120 s on a tunneled TPU), while extra
#: collocation points cost only microseconds per IPM iteration — so ~2x
#: degree jumps minimize total wall-clock even though they over-resolve.
DEGREE_BUCKETS = (4, 8, 16, 24, 32, 48, 64)


def bucket_degree(d: int, n_max: int = 64) -> int:
    """The uniform bucket degree a mesh with max degree ``d`` is padded to."""
    return next((b for b in DEGREE_BUCKETS if b >= d and b <= max(n_max, d)), d)


def pad_count(S: int) -> int:
    """The power-of-two segment count a mesh with ``S`` segments is padded to."""
    return 1 << (S - 1).bit_length() if S > 1 else 1


def bucket_mesh(
    degrees: tuple, fractions: tuple, n_max: int = 64
) -> tuple[tuple, tuple]:
    """Round a refined mesh UP to a bucketed shape signature.

    Pads every segment's degree to one uniform bucket value (≥ the max
    requested degree) and the segment count to the next power of two (by
    bisecting the widest intervals). Both transformations only ADD
    collocation points, so accuracy never drops; in exchange the mesh's
    static shape signature takes one of O(log²) values, so the jitted
    runtime-mesh solver (fractions are traced inputs) is compiled a handful
    of times per problem instead of once per grid. The reference pays the
    analogous cost as a full NLP re-setup per grid (``LpLpopcAlgorithm.cpp:
    36-45``); on TPU the equivalent cost is XLA recompilation — this is the
    mitigation SURVEY.md §7 calls "shape bucketing/padding".
    """
    deg = bucket_degree(max(degrees), n_max)
    S_b = pad_count(len(degrees))
    fr = list(fractions)
    while len(fr) - 1 < S_b:
        widths = np.diff(fr)
        k = int(np.argmax(widths))
        fr.insert(k + 1, (fr[k] + fr[k + 1]) / 2.0)
    return (deg,) * (len(fr) - 1), tuple(fr)


def ph_refine_phase(
    degrees: tuple, fractions: tuple, errs: np.ndarray,
    tol: float, n_min: int, n_max: int,
) -> tuple[tuple, tuple, bool]:
    """One ph-refinement pass for a phase; returns (degrees, fractions, ok)."""
    new_deg = []
    new_frac = [fractions[0]]
    ok = True
    for k, nk in enumerate(degrees):
        a, b = fractions[k], fractions[k + 1]
        e = float(errs[k])
        if e <= tol:
            new_deg.append(nk)
            new_frac.append(b)
            continue
        ok = False
        P = max(1, math.ceil(math.log(e / tol) / math.log(max(nk, 2))))
        if nk + P <= n_max:
            new_deg.append(nk + P)
            new_frac.append(b)
        else:
            B = max(math.ceil((nk + P) / n_min), 2)
            for j in range(1, B + 1):
                new_deg.append(n_min)
                new_frac.append(a + (b - a) * j / B)
            new_frac[-1] = b  # exact endpoint
    return tuple(new_deg), tuple(new_frac), ok
