"""Batched primal-dual interior-point NLP solver (the IPOPT replacement).

The reference hands its transcribed NLP to IPOPT + MUMPS
(``/root/reference/Lpopc/src/Core/LpopcIpopt.cpp``, ``LpNLPSolver.cpp``) —
a single-threaded CPU interior-point method with sparse LDLᵀ factorization.
This module re-designs that capability TPU-first:

* The whole solve is **one pure JAX function** — jit-able, vmap-able over
  problem instances, and differentiable in principle. Thousands of perturbed
  instances (different bounds / guesses) run in lockstep on one chip via
  ``vmap``, and across chips via ``shard_map`` (see ``lpopc_tpu.parallel``).
* The KKT system is **condensed to a symmetric positive-definite matrix**
  ``K = H + Σ + δI + Jᵀ D J`` (slacks and bound duals eliminated
  analytically), factorized by dense Cholesky — a pure MXU workload — instead
  of sparse LDLᵀ with pivoting, which does not map to the MXU at all. The
  dual regularization ``δc`` makes the condensation exact for equality rows.
* Inertia correction is **factorization-driven**: a Cholesky failure (NaN on
  the diagonal) triggers a primal regularization ``δw`` increase inside a
  ``lax.while_loop`` — no data-dependent Python control flow.
* Formulation follows the standard primal-dual method with slacks on every
  constraint row, logarithmic barriers on finite bounds only, a
  fraction-to-boundary rule, an Armijo backtracking line search on the
  barrier + ℓ1-penalty merit function, the monotone Fiacco–McCormick barrier
  schedule (μ ← min(κμ μ, μ^θμ)), and IPOPT-style dual safeguards.

Per-instance solver status (mirroring the reference's ``ocpstatus`` enum,
``LpLpopcAlgorithm.hpp:33-40``) ensures diverged instances never poison a
batch: converged/failed instances freeze while the rest keep iterating.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .problem import INF

# status codes
RUNNING = 0
SOLVED = 1
MAX_ITER = 2
FAILED = 3

_BIG = 1e20          # "infinite" Σ entry pinning fixed variables
_INF_CUT = 1e19      # bounds beyond this are treated as absent


@dataclass(frozen=True)
class IPMOptions:
    tol: float = 1e-8            # reference default Ipopt-tol is 1e-6
    max_iter: int = 200
    mu_init: float = 1e-1
    kappa_mu: float = 0.2        # linear mu decrease factor
    theta_mu: float = 1.5        # superlinear mu decrease exponent
    kappa_eps: float = 10.0      # barrier-problem tolerance = kappa_eps * mu
    tau_min: float = 0.99        # fraction-to-boundary
    kappa_1: float = 1e-2        # initial-point push-in
    s_max: float = 100.0         # residual scaling threshold
    kappa_sigma: float = 1e10    # dual safeguard
    delta_w0: float = 1e-4       # first nonzero primal regularization
    delta_w_max: float = 1e8     # cap on the boosted regularization start
    delta_w_stuck: float = 1e6   # boosted-delta level that triggers soft restoration
    mu_restore: float = 1e-2     # mu floor applied by the soft restoration
    # Dual (constraint) regularization. This is also the condensation penalty
    # for equality rows (d = 1/delta_c): kept moderate so cond(K) stays within
    # f64 range on stiff meshes; the full-KKT iterative refinement below
    # removes the O(delta_c) step perturbation (HyKKT / Golub-Greif gamma
    # strategy: gamma = 1/delta_c only needs to exceed ||S||).
    delta_c: float = 1e-6
    eta_phi: float = 1e-4        # Armijo constant
    gamma_theta: float = 1e-5    # filter margin on constraint violation
    gamma_phi: float = 1e-8     # filter margin on barrier objective
    s_theta: float = 1.1         # switching-condition exponents (IPOPT defaults)
    s_phi: float = 2.3
    delta_sw: float = 1.0        # switching-condition scale
    max_ls: int = 20             # max line-search halvings
    # Line-search evaluation: "parallel" evaluates ALL max_ls trial alphas
    # in one batched op and takes the first acceptable one — identical
    # semantics to the sequential halving loop, but with no sequential
    # dependency (under vmap the while_loop is LOCKSTEP: the whole batch
    # waits for the instance needing the most halvings). Measured on the
    # batch-512 brachistochrone TPU bench: 353 vs 364 solves/s — the filter
    # accepts the first trial almost always there, so the 20x trial work
    # buys nothing; default stays sequential. Use "parallel" for ragged
    # sweeps where backtracking depth varies across the batch.
    ls_mode: str = "sequential"
    max_reg: int = 30            # max regularization increases per iteration
    max_refine: int = 1          # iterative-refinement rounds on the KKT step
    record_history: bool = False # per-iteration (kkt, mu, alpha, delta) trace
    lane_kkt: bool = False       # lane-parallel Pallas KKT kernels under vmap
    # Apply-mode factorization: for small condensed systems (n below this
    # threshold) the Cholesky factor's INVERSE is formed once per
    # factorization (one triangular solve with n right-hand sides — a single
    # well-utilized op) so that each of the ~9 KKT solves per IPM iteration
    # becomes two matvecs (pure MXU work) instead of a latency-bound
    # sequential triangular solve. This is what makes a vmapped instance
    # sweep scale with batch on TPU.
    inverse_threshold: int = 600
    # Factorization precision: "f64" | "f32". f32 runs the Cholesky +
    # triangular math on the TPU's native f32 units (f64 is emulated and
    # ~10x slower); the f64 iterative refinement against the TRUE KKT system
    # (below) restores full accuracy as long as the equilibrated K's
    # condition number stays below ~1/eps_f32, which the symmetric Jacobi
    # equilibration enforces in practice. (SURVEY §7 hard-part 3.)
    factor_dtype: str = "f64"
    # Barrier strategy: "monotone" (Fiacco-McCormick, mu shrinks only when
    # the barrier subproblem is solved), "adaptive" (LOQO/Vanderbei
    # centrality rule: mu tracks sigma * mean complementarity each iteration —
    # reference parity with IPOPT's mu_strategy=adaptive, LpNLPSolver.cpp:28),
    # or "probing" (Mehrotra affine-scaling probe: per iteration, solve the
    # mu=0 predictor system WITH THE SAME factorization — one extra condensed
    # solve, i.e. 2 matvecs in apply mode — measure how much complementarity
    # the pure Newton step could remove, and set mu = (mu_aff/mu)^3 * mu.
    # This is IPOPT's other adaptive oracle; it front-loads large mu cuts on
    # well-centred problems where the monotone schedule spends iterations
    # walking mu down one kappa_mu factor at a time), or "mehrotra"
    # (probing plus the second-order corrector: per-bound complementarity
    # targets mu - dg_aff*dz_aff, Gondzio-clipped to [0.1, 10] mu).
    mu_strategy: str = "monotone"
    # Feasibility restoration (IPOPT-style, invoked on filter deadlock at an
    # infeasible iterate): Gauss-Newton minimize-||c|| iterations reusing the
    # same condensed-KKT factorization. False falls back to round-1's soft
    # re-centering only.
    restoration: bool = True
    resto_max_iter: int = 15


class IPMResult(NamedTuple):
    z: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray            # equality multipliers (constraint rows)
    zl_dual: jnp.ndarray        # bound duals on [z; s], lower
    zu_dual: jnp.ndarray
    status: jnp.ndarray         # () int32
    iterations: jnp.ndarray     # () int32
    objective: jnp.ndarray
    kkt_error: jnp.ndarray
    mu: jnp.ndarray
    delta_w: jnp.ndarray
    history: dict | None = None  # populated when options.record_history


def _masked_min(vals, mask, fill=jnp.inf):
    return jnp.min(jnp.where(mask, vals, fill))


def build_solver(
    objective: Callable,
    constraints: Callable,
    n: int,
    m: int,
    options: IPMOptions = IPMOptions(),
    jac_fn: Callable | None = None,
    hess_fn: Callable | None = None,
    kkt_factorizer: tuple | None = None,
    takes_aux: bool = False,
    structured_kkt=None,
) -> Callable:
    """Return ``solve(z0, zl, zu, cl, cu) -> IPMResult`` (pure; jit/vmap-able).

    Bounds are runtime arguments so an instance sweep (perturbed initial
    conditions, terminal sets, pinned parameters) is just a ``vmap`` over
    them. ``jac_fn(z) -> (m, n)`` and ``hess_fn(z, lam) -> (n, n)`` override
    the global-AD derivatives with structure-exploiting assembly
    (see :mod:`.structured`). ``structured_kkt`` — a
    :class:`.kkt_blocks.BoundKKT` (or, with ``takes_aux``, a factory
    ``aux -> BoundKKT``) — goes fully matrix-free: J/H matvecs from per-node
    blocks and DIRECT per-segment assembly of the condensed KKT into
    (A, B, C) block form, no dense (m, n)/(n, n) intermediates (O(S·b²)
    memory); it overrides jac_fn/hess_fn/kkt_factorizer.
    ``kkt_factorizer`` is an optional
    ``(factorize, solve, factor_ok)`` triple replacing dense Cholesky on the
    condensed K — e.g. the segment-block + border-Schur factorization of
    :mod:`.block_kkt`.

    With ``takes_aux=True`` the problem callables take a trailing pytree
    argument — ``objective(z, aux)``, ``constraints(z, aux)``,
    ``jac_fn(z, aux)``, ``hess_fn(z, lam, aux)`` — and ``solve`` gains a
    trailing ``aux`` input. This is what lets ONE compiled solver serve every
    mesh/scaling with the same shape signature (runtime-mesh hp refinement,
    ``core/solve.py``): aux carries the mesh fractions and scale vectors as
    traced arrays instead of baked constants.
    """
    opt = options
    obj_base, con_base = objective, constraints
    jac_base, hess_base = jac_fn, hess_fn

    if kkt_factorizer is not None:
        _factorize, _fsolve, _factor_ok = kkt_factorizer
    elif opt.lane_kkt:
        from ..ops.batched_linalg import smart_cholesky_and_solve

        _chol, _cho_solve = smart_cholesky_and_solve()
        _factorize = _chol
        _fsolve = _cho_solve
        _factor_ok = lambda L: (
            jnp.all(jnp.isfinite(jnp.diagonal(L))) & (jnp.min(jnp.diagonal(L)) > 0.0)
        )
    elif n <= opt.inverse_threshold:
        # apply mode: form L^{-1} (ONE triangular solve with n rhs) and — in
        # f64 — K^{-1} = L^{-T} L^{-1} (one matmul) once per factorization, so
        # every one of the ~9 KKT solves per IPM iteration is a SINGLE matvec
        # (batched small ops on TPU are op-count-bound, not flop-bound). In
        # f32 the explicit inverse is measurably less reliable on the
        # ill-conditioned endgame K's (batch solve rate drops ~20%), so the
        # f32 factorization keeps the two-triangular-matvec form.
        _one_matvec = opt.factor_dtype != "f32"

        def _factorize(K):
            # blocked recursive factorization: O(log n) batched matmuls
            # instead of XLA's O(n)-step sequential while loops — measured
            # 85% of IPM iteration time under vmap on TPU (ops/blocked_chol).
            from ..ops.blocked_chol import chol_and_inverse

            L, Linv = chol_and_inverse(K)
            return L, (Linv.T @ Linv if _one_matvec else Linv)

        def _fsolve(F, b):
            if _one_matvec:
                return F[1] @ b
            return F[1].T @ (F[1] @ b)

        def _factor_ok(F):
            dL = jnp.diagonal(F[0])
            return (
                jnp.all(jnp.isfinite(dL)) & (jnp.min(dL) > 0.0)
                & jnp.all(jnp.isfinite(F[1]))
            )
    else:
        _factorize = jnp.linalg.cholesky
        _fsolve = lambda L, b: jax.scipy.linalg.cho_solve((L, True), b)
        _factor_ok = lambda L: (
            jnp.all(jnp.isfinite(jnp.diagonal(L))) & (jnp.min(jnp.diagonal(L)) > 0.0)
        )

    # equilibrated, dtype-cast wrappers around the raw factorizer: solves are
    # against the ORIGINAL K (the Jacobi scaling E K E is internal), so all
    # call sites and the refinement logic are unchanged.
    _fdt = jnp.float32 if opt.factor_dtype == "f32" else None

    def _eq_factorize(K):
        e = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(K)), 1e-12))
        Keq = K * (e[:, None] * e[None, :])
        if _fdt is not None:
            Keq = Keq.astype(_fdt)
        return _factorize(Keq), e

    def _eq_solve(Fe, b):
        F, e = Fe
        rhs = e * b
        if _fdt is not None:
            x = _fsolve(F, rhs.astype(_fdt)).astype(b.dtype)
        else:
            x = _fsolve(F, rhs)
        return e * x

    def _eq_ok(Fe):
        return _factor_ok(Fe[0])

    def solve(z0, zl, zu, cl, cu, lam0=None, aux=None, zl_d_init=None,
              zu_d_init=None, tol=None):
        # `tol` (optional, traced) overrides opt.tol for the CONVERGENCE
        # TEST only — the hp driver's adaptive per-grid tolerance schedule
        # loosens coarse grids without recompiling (everything else keyed
        # off opt.tol — mu floor, theta_min — stays static).
        tol_eff = (
            jnp.asarray(opt.tol, z0.dtype) if tol is None
            else jnp.asarray(tol, z0.dtype)
        )
        if takes_aux:
            objective = lambda z: obj_base(z, aux)
            constraints = lambda z: con_base(z, aux)
            jac_fn = None if jac_base is None else (lambda z: jac_base(z, aux))
            hess_fn = (
                None if hess_base is None else (lambda z, lam: hess_base(z, lam, aux))
            )
        else:
            objective, constraints = obj_base, con_base
            jac_fn, hess_fn = jac_base, hess_base
        grad_f = jax.grad(objective)
        sk = (
            structured_kkt(aux)
            if (structured_kkt is not None and takes_aux)
            else structured_kkt
        )
        use_sk = sk is not None

        def lagrangian(z, lam):
            return objective(z) + jnp.dot(lam, constraints(z))

        hess_l = hess_fn if hess_fn is not None else jax.hessian(lagrangian, argnums=0)
        jac_c = jac_fn if jac_fn is not None else jax.jacfwd(constraints)

        dtype = z0.dtype
        wl = jnp.concatenate([zl, cl]).astype(dtype)
        wu = jnp.concatenate([zu, cu]).astype(dtype)
        fixed = (wu - wl) <= 1e-14
        has_lo = (wl > -_INF_CUT) & ~fixed
        has_up = (wu < _INF_CUT) & ~fixed

        def gaps(w):
            gl = jnp.where(has_lo, w - wl, 1.0)
            gu = jnp.where(has_up, wu - w, 1.0)
            return gl, gu

        def push_inside(v, lo, hi):
            # IPOPT-style strict interior push (kappa_1 = kappa_2 = 1e-2).
            span = hi - lo
            pl = jnp.minimum(opt.kappa_1 * jnp.maximum(1.0, jnp.abs(lo)), opt.kappa_1 * span)
            pu = jnp.minimum(opt.kappa_1 * jnp.maximum(1.0, jnp.abs(hi)), opt.kappa_1 * span)
            lo_eff = jnp.where(lo > -_INF_CUT, lo + pl, lo)
            hi_eff = jnp.where(hi < _INF_CUT, hi - pu, hi)
            return jnp.clip(v, jnp.minimum(lo_eff, hi_eff), jnp.maximum(lo_eff, hi_eff))

        # ----- initialization -----
        z_init = jnp.where(fixed[:n], wl[:n], push_inside(z0, zl, zu))
        c0 = constraints(z_init)
        s_init = jnp.where(fixed[n:], wl[n:], push_inside(c0, cl, cu))
        w0 = jnp.concatenate([z_init, s_init])
        gl0, gu0 = gaps(w0)
        nb = jnp.sum(has_lo) + jnp.sum(has_up)
        mu_min = jnp.asarray(max(1e-13, opt.tol / 100.0), dtype)
        if zl_d_init is None:
            mu0 = jnp.asarray(opt.mu_init, dtype)
            zl_d0 = jnp.where(has_lo, mu0 / gl0, 0.0)
            zu_d0 = jnp.where(has_up, mu0 / gu0, 0.0)
        else:
            # Warm-started bound duals (IPOPT-style warm start across hp
            # grids): mu starts at the carried average complementarity rather
            # than mu_init, and the duals are kept up to the kappa_sigma
            # safeguard corridor around the new central path.
            zl_w = jnp.where(has_lo, jnp.maximum(jnp.asarray(zl_d_init, dtype), 0.0), 0.0)
            zu_w = jnp.where(has_up, jnp.maximum(jnp.asarray(zu_d_init, dtype), 0.0), 0.0)
            comp = (
                jnp.sum(jnp.where(has_lo, zl_w * gl0, 0.0))
                + jnp.sum(jnp.where(has_up, zu_w * gu0, 0.0))
            ) / jnp.maximum(1.0, nb)
            mu0 = jnp.clip(comp, 10.0 * mu_min, jnp.asarray(opt.mu_init, dtype))
            zl_d0 = jnp.where(
                has_lo,
                jnp.clip(zl_w, mu0 / (opt.kappa_sigma * gl0), opt.kappa_sigma * mu0 / gl0),
                0.0,
            )
            zu_d0 = jnp.where(
                has_up,
                jnp.clip(zu_w, mu0 / (opt.kappa_sigma * gu0), opt.kappa_sigma * mu0 / gu0),
                0.0,
            )
        lam0 = jnp.zeros((m,), dtype) if lam0 is None else jnp.asarray(lam0, dtype)

        def kkt_error_parts(w, lam, zl_d, zu_d):
            """Shared pieces of IPOPT's scaled optimality error E_mu (eq. 5).
            One gradient + Jacobian + constraint evaluation serves the barrier
            (E_mu) and outer (E_0) tests AND is carried into the next
            iteration's step (which needs exactly g/J/c at this point).
            ``Jop`` is the dense (m, n) Jacobian, or the per-node block tree
            in structured-KKT mode."""
            z = w[:n]
            g_z = grad_f(z)
            if use_sk:
                Jop = sk.jac_blocks(z)
                jt = sk.jtv(Jop, lam)
            else:
                Jop = jac_c(z)
                jt = Jop.T @ lam
            c_val = constraints(z)
            g = jnp.concatenate([g_z, jnp.zeros((m,), dtype)])
            jt_lam = jnp.concatenate([jt, -lam])
            r_d = g + jt_lam - jnp.where(has_lo, zl_d, 0.0) + jnp.where(has_up, zu_d, 0.0)
            r_d = jnp.where(fixed, 0.0, r_d)
            r_p = c_val - w[n:]
            gl, gu = gaps(w)
            comp_l = jnp.where(has_lo, zl_d * gl, 0.0)
            comp_u = jnp.where(has_up, zu_d * gu, 0.0)
            dual_norm = jnp.sum(jnp.abs(lam)) + jnp.sum(jnp.abs(zl_d)) + jnp.sum(jnp.abs(zu_d))
            denom = jnp.maximum(1.0, (m + nb)).astype(dtype)
            s_d = jnp.maximum(opt.s_max, dual_norm / denom) / opt.s_max
            s_c = jnp.maximum(opt.s_max, (jnp.sum(jnp.abs(zl_d)) + jnp.sum(jnp.abs(zu_d))) / jnp.maximum(1.0, nb)) / opt.s_max
            e_d = jnp.max(jnp.abs(r_d)) / s_d
            e_p = jnp.max(jnp.abs(r_p)) if m > 0 else jnp.zeros((), dtype)
            return (e_d, e_p, comp_l, comp_u, s_c), (g_z, Jop, c_val)

        def error_from_parts(parts, mu):
            e_d, e_p, comp_l, comp_u, s_c = parts
            e_c = jnp.maximum(
                jnp.max(jnp.abs(jnp.where(has_lo, comp_l - mu, 0.0))),
                jnp.max(jnp.abs(jnp.where(has_up, comp_u - mu, 0.0))),
            ) / s_c
            return jnp.maximum(jnp.maximum(e_d, e_p), e_c)

        def kkt_error(w, lam, zl_d, zu_d, mu):
            parts, _ = kkt_error_parts(w, lam, zl_d, zu_d)
            return error_from_parts(parts, mu)

        def barrier_phi(w, mu):
            gl, gu = gaps(w)
            return (
                objective(w[:n])
                - mu * jnp.sum(jnp.where(has_lo, jnp.log(gl), 0.0))
                - mu * jnp.sum(jnp.where(has_up, jnp.log(gu), 0.0))
            )

        def theta(w):
            return jnp.sum(jnp.abs(constraints(w[:n]) - w[n:]))

        theta0_init = theta(w0)
        theta_min = 1e-4 * jnp.maximum(1.0, theta0_init)
        theta_max = 1e4 * jnp.maximum(1.0, theta0_init)
        n_filter = opt.max_iter + 1

        # ----- one interior-point iteration -----
        def step(state):
            (w, lam, zl_d, zu_d, mu, delta_last, it, status, hist,
             f_theta, f_phi, f_count, delta_start, gjc, _e0_prev,
             ls_fails, resto_left, theta_entry, resto_strikes) = state
            in_resto = resto_left > 0
            z = w[:n]
            gl, gu = gaps(w)
            g_z, Jop, c_val = gjc  # carried from the previous convergence check
            if use_sk:
                Hop = sk.hess_blocks(z, lam)
                jv_ = lambda v: sk.jv(Jop, v)
                jtv_ = lambda u: sk.jtv(Jop, u)
                hv_ = lambda v: sk.hv(Hop, v)
            else:
                J = Jop
                H = hess_l(z, lam)
                jv_ = lambda v: J @ v
                jtv_ = lambda u: J.T @ u
                hv_ = lambda v: H @ v
            r_p = c_val - w[n:]

            sigma = jnp.where(has_lo, zl_d / gl, 0.0) + jnp.where(has_up, zu_d / gu, 0.0)
            sigma = jnp.where(fixed, _BIG, sigma)
            sigma_z, sigma_s = sigma[:n], sigma[n:]
            # Slack rows with no finite bound (a vacuous constraint row) have
            # sigma_s = 0, which would make the condensation divide by zero at
            # delta_w = 0 and force spurious regularization every iteration;
            # a tiny floor keeps the row inert (d ~ 1e-8 drops it from K)
            # while all divisions stay finite.
            free_s = (~has_lo[n:]) & (~has_up[n:]) & (~fixed[n:])
            sigma_s = jnp.where(free_s, jnp.maximum(sigma_s, 1e-8), sigma_s)

            # mu-perturbed dual residuals (a: z rows, b: s rows).
            # Feasibility-restoration mode (the reference inherits IPOPT's
            # restoration phase through OptimizeTNLP, LpNLPSolver.cpp:45).
            # Entered when the filter deadlocks at an infeasible iterate (see
            # the `stuck` logic below): the objective gradient and Jᵀλ drop
            # out of the dual residual, so the Newton system below produces
            # the barrier-safeguarded generalized Gauss-Newton step for
            # min ½‖c(z) − s‖² in the W̃ = H + Σ + δI metric — a true
            # minimize-‖c‖ subproblem REUSING the same condensed KKT
            # factorization (no second solver). The line search then demands
            # plain sufficient decrease of θ instead of the filter test.
            jtv_lam = jtv_(lam)

            def dual_rhs(tl, tu):
                """(a, b) for per-bound complementarity targets tl/tu (scalar
                mu broadcasts; the Mehrotra corrector passes vectors)."""
                mt = -jnp.where(has_lo, tl / gl, 0.0) + jnp.where(has_up, tu / gu, 0.0)
                a_ = jnp.where(fixed[:n], 0.0, g_z + jtv_lam + mt[:n])
                b_ = jnp.where(fixed[n:], 0.0, -lam + mt[n:])
                a_ = jnp.where(in_resto & ~fixed[:n], mt[:n], a_)
                b_ = jnp.where(in_resto & ~fixed[n:], mt[n:], b_)
                return a_, b_, mt

            corrector = opt.mu_strategy == "mehrotra"
            probing = corrector or opt.mu_strategy == "probing"
            ones_b = jnp.ones((n + m,), dtype)
            if not probing:
                a, b, mu_term = dual_rhs(mu, mu)

            delta_c = opt.delta_c

            def make_step(delta_w):
                sig_s = sigma_s + delta_w                    # Ŝ
                d = sig_s / (1.0 + delta_c * sig_s)
                wdiag = sigma_z + delta_w
                if use_sk:
                    F = sk.factorize(Jop, Hop, d, wdiag)
                    solveK = lambda r: sk.fsolve(F, r)
                    okF = sk.factor_ok(F)
                    kv = lambda v: hv_(v) + wdiag * v + jtv_(d * jv_(v))
                else:
                    K = H + jnp.diag(wdiag) + (J.T * d) @ J
                    L = _eq_factorize(K)
                    solveK = lambda r: _eq_solve(L, r)
                    okF = _eq_ok(L)
                    kv = lambda v: K @ v

                def finish(dz_, rb, rc):
                    """Back out (ds, dlam) from a condensed solution dz_."""
                    dlam_ = d * (jv_(dz_) - rc - rb / sig_s)
                    ds_ = (dlam_ + rb) / sig_s
                    return dz_, ds_, dlam_

                if probing:
                    # Mehrotra affine-scaling probe (IPOPT's mu-oracle
                    # "probing"): solve the mu=0 predictor system with the
                    # factorization just built (one extra condensed solve +
                    # one refinement round — 4 matvecs in apply mode), take
                    # the fraction-to-boundary affine step lengths, and set
                    # sigma = (mu_aff/mu)^3. Centred iterates where the pure
                    # Newton step keeps the gaps open get sigma ~ 1 (stay);
                    # iterates where it would slash complementarity get
                    # sigma ~ 0 (cut mu hard) — the front-loaded mu schedule
                    # the monotone rule walks down one kappa_mu at a time.
                    zero_mu = jnp.zeros((), dtype)
                    a0, b0, _ = dual_rhs(zero_mu, zero_mu)
                    rhs_a = -a0 - jtv_(d * (r_p + b0 / sig_s))
                    # unrefined solve: the probe only steers mu, so the f64
                    # backward error of a single solve is plenty
                    dza0 = solveK(rhs_a)
                    dza, dsa, _dla = finish(dza0, -b0, -r_p)
                    dwa = jnp.concatenate([dza, dsa])
                    dzl_a = jnp.where(has_lo, -zl_d - zl_d * dwa / gl, 0.0)
                    dzu_a = jnp.where(has_up, -zu_d + zu_d * dwa / gu, 0.0)
                    tau_a = 0.995
                    ap = jnp.clip(jnp.minimum(
                        _masked_min(-tau_a * gl / jnp.minimum(dwa, -1e-300),
                                    has_lo & (dwa < 0)),
                        _masked_min(tau_a * gu / jnp.maximum(dwa, 1e-300),
                                    has_up & (dwa > 0)),
                    ), 0.0, 1.0)
                    ad = jnp.clip(jnp.minimum(
                        _masked_min(-tau_a * zl_d / jnp.minimum(dzl_a, -1e-300),
                                    has_lo & (dzl_a < 0)),
                        _masked_min(-tau_a * zu_d / jnp.minimum(dzu_a, -1e-300),
                                    has_up & (dzu_a < 0)),
                    ), 0.0, 1.0)
                    comp0 = (
                        jnp.sum(jnp.where(has_lo, zl_d * gl, 0.0))
                        + jnp.sum(jnp.where(has_up, zu_d * gu, 0.0))
                    ) / jnp.maximum(1.0, nb)
                    comp_a = (
                        jnp.sum(jnp.where(
                            has_lo, (gl + ap * dwa) * (zl_d + ad * dzl_a), 0.0))
                        + jnp.sum(jnp.where(
                            has_up, (gu - ap * dwa) * (zu_d + ad * dzu_a), 0.0))
                    ) / jnp.maximum(1.0, nb)
                    sig_m = jnp.clip(
                        (jnp.maximum(comp_a, 0.0)
                         / jnp.maximum(comp0, 1e-300)) ** 3,
                        1e-4, 1.0,
                    )
                    mu_t = jnp.clip(
                        sig_m * comp0, mu_min, jnp.asarray(opt.mu_init, dtype)
                    )
                    # a failed probe (non-finite affine step: factorization is
                    # being rejected this reg round anyway) or restoration
                    # mode (mu frozen) keeps the incoming mu
                    mu_t = jnp.where(
                        in_resto | (nb == 0) | ~jnp.all(jnp.isfinite(dwa)),
                        mu, mu_t,
                    )
                    if corrector:
                        # Mehrotra second-order corrector: per-bound targets
                        # mu_t - dg_aff * dz_aff (the complementarity the
                        # affine step would leave behind), Gondzio-clipped to
                        # [0.1, 10] mu_t so outliers cannot hijack the step.
                        # Disabled while the probe is untrusted (same guard
                        # as mu_t above: non-finite affine direction).
                        guard = in_resto | ~jnp.all(jnp.isfinite(dwa))
                        pl = jnp.where(has_lo & ~guard, dwa * dzl_a, 0.0)
                        pu = jnp.where(has_up & ~guard, -dwa * dzu_a, 0.0)
                        tl = jnp.clip(mu_t - pl, 0.1 * mu_t, 10.0 * mu_t)
                        tu = jnp.clip(mu_t - pu, 0.1 * mu_t, 10.0 * mu_t)
                    else:
                        tl = mu_t * ones_b
                        tu = mu_t * ones_b
                    aa, bb, _ = dual_rhs(tl, tu)
                else:
                    mu_t = mu
                    tl = mu * ones_b
                    tu = mu * ones_b
                    aa, bb = a, b

                def csolve(ra, rb, rc):
                    """Solve the delta_c-regularized Newton system
                    [W̃ Jᵀ; J -(Ŝ⁻¹+δc)]-style for a general rhs (ra, rb, rc):
                    W̃dz + Jᵀdλ = ra;  Ŝds - dλ = rb;  Jdz - ds - δc dλ = rc.
                    Used only for the CORRECTION step of the full-KKT
                    refinement, where the rhs is already a small residual:
                    in f64 one unrefined solve suffices (every f64 dot at
                    these shapes lowers to ~32 bf16 limb passes on TPU — op
                    count is the budget); f32 factors keep one inner
                    refinement round to hold the stage-1 step quality."""
                    rhs = ra + jtv_(d * (rc + rb / sig_s))
                    dz_ = solveK(rhs)
                    if _fdt is not None:
                        dz_ = dz_ + solveK(rhs - kv(dz_))
                    return finish(dz_, rb, rc)

                # Indefiniteness detection. XLA's Cholesky (unlike LAPACK) can
                # complete WITHOUT NaNs on an indefinite matrix, silently
                # producing the factor of a different (PSD) matrix — so NaN
                # checks alone are not a valid inertia test. Instead exploit
                # iterative refinement: with M = LLᵀ the iteration contracts
                # iff ρ(I - M⁻¹K) < 1, which fails whenever K has meaningful
                # negative curvature (M PSD ⇒ some eigenvalue of M⁻¹K ≤ 0 ⇒
                # divergence). A growing refinement residual flags indefinite
                # K and triggers the δw regularization search. The SAME solve
                # chain is the main Newton step: its rhs0 is exactly the
                # csolve(-a, -b, -r_p) condensed rhs, so the twice-refined dz1
                # is both the inertia probe and the step (one shared chain —
                # 3 solves + 3 K-applies instead of the naive 5 + 4).
                rhs0 = -aa - jtv_(d * (r_p + bb / sig_s))
                dz0 = solveK(rhs0)
                kdz0 = kv(dz0)
                r0 = jnp.max(jnp.abs(rhs0 - kdz0))
                dz1 = dz0 + solveK(rhs0 - kdz0)
                kdz1 = kv(dz1)
                r1 = jnp.max(jnp.abs(rhs0 - kdz1))
                dz1 = dz1 + solveK(rhs0 - kdz1)
                # f64: unchanged semantics — the once-refined residual r1 is
                # the divergence probe, as it always was (margins below are
                # tuned for it). f32 is the path that changed: its floor/growth
                # margins are tuned for the residual AFTER the second
                # refinement round, and measuring one round early made the
                # inertia test reject legitimate endgame steps (every barrier-
                # endgame iteration regularized -> MAX_ITER; caught by
                # test_round2::test_f32_factorization_...) — so f32 spends one
                # extra K-apply to measure post-round-2.
                r_end = r1 if _fdt is None else jnp.max(jnp.abs(rhs0 - kv(dz1)))
                # Absolute floor: a backward-stable solve leaves a residual of
                # order eps * ||K|| ||dz|| (NOT eps * ||rhs||: the two differ by
                # the cancellation factor ||K|| ||dz|| / ||rhs||), and iterative
                # refinement stagnates there rather than contracting further.
                # Below that level the r_end/r0 ratio compares two noise
                # quantities and "growth" is meaningless — so the floor must
                # scale with max(||rhs||, ||K dz||). With f32 factors the noise
                # level is 2^-24-based and the contraction per round is coarser
                # (~cond(EKE) * 2^-24), so both margins widen.
                res_scale = 1.0 + jnp.maximum(
                    jnp.max(jnp.abs(rhs0)), jnp.max(jnp.abs(kdz1))
                )
                if _fdt is None:
                    floor = 1e-9 * res_scale
                    growth = 1.2
                else:
                    floor = 3e-5 * res_scale
                    growth = 3.0
                ok = (
                    okF
                    & jnp.all(jnp.isfinite(dz1))
                    & ((r_end <= growth * r0 + 1e-300) | (r_end <= floor))
                )

                dz, ds, dlam = finish(dz1, -bb, -r_p)
                # Full-KKT iterative refinement: correct the step against the
                # TRUE Newton system (no delta_c on the constraint row), using
                # the condensed factorization as the solver. Removes both the
                # penalty perturbation on equality rows and rounding error.
                # f32 factors need TWO rounds: one leaves the step at the f32
                # noise plateau and the barrier endgame stalls just above
                # tol~1e-4 on bucketed (deg-8) meshes (measured: 1 round ->
                # MAX_ITER at kkt 2.3e-4; 2 -> converged, kkt 9e-5; 3 ->
                # diverges again, the extra correction re-injects f32 noise).
                n_refine = (
                    max(1, opt.max_refine) if _fdt is None
                    else max(2, opt.max_refine)
                )
                for _ in range(n_refine):
                    e1 = -aa - (hv_(dz) + wdiag * dz + jtv_(dlam))
                    e1 = jnp.where(fixed[:n], 0.0, e1)
                    e2 = jnp.where(fixed[n:], 0.0, -bb - (sig_s * ds - dlam))
                    e3 = -r_p - (jv_(dz) - ds)
                    cz, cs, clam = csolve(e1, e2, e3)
                    dz = dz + cz
                    ds = ds + cs
                    dlam = dlam + clam
                ds = jnp.where(fixed[n:], 0.0, ds)
                dz = jnp.where(fixed[:n], 0.0, dz)
                return dz, ds, dlam, ok, (r0, r_end), mu_t, tl, tu

            # regularization loop: grow delta_w until the factorization succeeds
            def reg_cond(carry):
                k, delta_w, _, _, _, ok, _, _, _, _ = carry
                return (~ok) & (k < opt.max_reg)

            def reg_body(carry):
                k, delta_w = carry[0], carry[1]
                dz, ds, dlam, ok, diag, mu_t, tl, tu = make_step(delta_w)
                next_delta = jnp.where(
                    delta_w == 0.0,
                    jnp.maximum(opt.delta_w0, delta_last / 3.0),
                    delta_w * 10.0,
                )
                return (k + 1, next_delta, dz, ds, dlam, ok, diag, mu_t, tl, tu)

            zeros_n = jnp.zeros((n,), dtype)
            zeros_m = jnp.zeros((m,), dtype)
            zero_ = jnp.zeros((), dtype)
            k0 = (0, delta_start, zeros_n, zeros_m, zeros_m, jnp.asarray(False),
                  (zero_, zero_), mu, mu * ones_b, mu * ones_b)
            (k, delta_next, dz, ds, dlam, ok, reg_diag, mu_u, tl_u,
             tu_u) = jax.lax.while_loop(reg_cond, reg_body, k0)
            # mu actually used in this iteration's step: the probe's choice
            # under "probing", the incoming mu otherwise (mu_t == mu there).
            # Every downstream mu-consistent quantity (dual directions,
            # fraction-to-boundary tau, barrier merit, safeguards) uses mu_u.
            if probing:
                mu_term = (
                    -jnp.where(has_lo, mu_u / gl, 0.0)
                    + jnp.where(has_up, mu_u / gu, 0.0)
                )
            delta_used = jnp.where(
                k > 1, delta_next / 10.0, delta_start
            )

            dw = jnp.concatenate([dz, ds])
            # bound-dual directions recovered from the SAME per-bound targets
            # the condensed solve eliminated them with (tl_u/tu_u == mu_u for
            # every strategy except the mehrotra corrector)
            dzl_d = jnp.where(has_lo, tl_u / gl - zl_d - zl_d * dw / gl, 0.0)
            dzu_d = jnp.where(has_up, tu_u / gu - zu_d + zu_d * dw / gu, 0.0)

            # fraction-to-boundary
            tau = jnp.maximum(opt.tau_min, 1.0 - mu_u)
            alpha_l = _masked_min(-tau * gl / jnp.minimum(dw, -1e-300), has_lo & (dw < 0))
            alpha_u = _masked_min(tau * gu / jnp.maximum(dw, 1e-300), has_up & (dw > 0))
            alpha_max = jnp.clip(jnp.minimum(alpha_l, alpha_u), 0.0, 1.0)
            a_zl = _masked_min(-tau * zl_d / jnp.minimum(dzl_d, -1e-300), has_lo & (dzl_d < 0))
            a_zu = _masked_min(-tau * zu_d / jnp.minimum(dzu_d, -1e-300), has_up & (dzu_d < 0))
            alpha_dual = jnp.clip(jnp.minimum(a_zl, a_zu), 0.0, 1.0)

            # ----- filter line search (IPOPT-style, Waechter-Biegler) -----
            # Accept a trial if it improves feasibility theta or barrier phi
            # relative to the current point AND is not dominated by a filter
            # entry; near feasibility (switching condition) demand Armijo
            # decrease of phi. This is what lets steps through when an l1
            # merit function would reject everything (Maratos-type stalls).
            phi0 = barrier_phi(w, mu_u)
            # theta(w) = sum|c(z) - s| with c carried in gjc — no fresh
            # constraints evaluation (r_p above is exactly c_val - s)
            th0 = jnp.sum(jnp.abs(r_p))

            def barrier_only(w_):
                gl_, gu_ = gaps(w_)
                return -mu_u * (
                    jnp.sum(jnp.where(has_lo, jnp.log(gl_), 0.0))
                    + jnp.sum(jnp.where(has_up, jnp.log(gu_), 0.0))
                )

            # Restoration merit phi_R = 1/2||c - s||^2_D + barrier, with D the
            # condensation weights actually used in the step (d ~ 1/delta_c on
            # equality rows): this is the objective whose Gauss-Newton step
            # the restoration direction IS, so its Armijo test must use the
            # same weights — an unweighted theta test can be opposed by the
            # barrier pull-in near bounds and rejects legitimate steps.
            sig_used = sigma_s + delta_used
            d_used = sig_used / (1.0 + delta_c * sig_used)
            phi_r0 = 0.5 * jnp.sum(d_used * r_p * r_p) + barrier_only(w)
            dphi_r = jnp.dot(d_used * r_p, jv_(dz) - ds) + jnp.dot(
                jnp.where(fixed, 0.0, mu_term), dw
            )
            gl_safe = jnp.where(has_lo, gl, 1.0)
            gu_safe = jnp.where(has_up, gu, 1.0)
            grad_phi = (
                jnp.concatenate([g_z, jnp.zeros((m,), dtype)])
                - jnp.where(has_lo, mu_u / gl_safe, 0.0)
                + jnp.where(has_up, mu_u / gu_safe, 0.0)
            )
            dphi = jnp.dot(jnp.where(fixed, 0.0, grad_phi), dw)
            filter_active = (
                jnp.arange(n_filter) < f_count
            )

            def trial_ok(alpha):
                w_t = w + alpha * dw
                rp_t = constraints(w_t[:n]) - w_t[n:]   # one eval serves
                th_t = jnp.sum(jnp.abs(rp_t))           # theta AND phi_R
                phi_t = barrier_phi(w_t, mu_u)
                finite = jnp.isfinite(th_t) & jnp.isfinite(phi_t)
                dominated = jnp.any(
                    filter_active & (th_t >= f_theta) & (phi_t >= f_phi)
                )
                switching = (dphi < 0.0) & (
                    alpha * (-dphi) ** opt.s_phi
                    > opt.delta_sw * th0 ** opt.s_theta
                )
                armijo = phi_t <= phi0 + opt.eta_phi * alpha * dphi
                progress = (th_t <= (1.0 - opt.gamma_theta) * th0) | (
                    phi_t <= phi0 - opt.gamma_phi * th0
                )
                use_armijo = (th0 <= theta_min) & switching
                acceptable = jnp.where(use_armijo, armijo, progress)
                # restoration mode: Armijo on the restoration merit phi_R
                phi_r_t = 0.5 * jnp.sum(d_used * rp_t * rp_t) + barrier_only(w_t)
                resto_ok = (
                    jnp.isfinite(phi_r_t)
                    & (dphi_r < 0.0)   # non-descent direction: force reg bump
                    & (phi_r_t <= phi_r0 + opt.eta_phi * alpha * dphi_r)
                )
                acc = jnp.where(
                    in_resto,
                    resto_ok,
                    finite & (th_t <= theta_max) & ~dominated & acceptable,
                )
                return acc, (~in_resto) & use_armijo & armijo

            # If the search fails, the final (tiny) alpha is taken anyway and
            # the next iteration starts its regularization search from a
            # boosted delta; FAILED is flagged only on non-finite steps.
            if opt.ls_mode == "parallel":
                alphas = alpha_max * 0.5 ** jnp.arange(opt.max_ls, dtype=dtype)
                ok_all, armijo_all = jax.vmap(trial_ok)(alphas)
                first = jnp.argmax(ok_all)          # first acceptable trial
                accepted = jnp.any(ok_all)
                pick = jnp.where(accepted, first, opt.max_ls - 1)
                # the sequential loop's failure alpha is alpha_max * 0.5^max_ls
                alpha = jnp.where(accepted, alphas[pick], alphas[-1] * 0.5)
                armijo_case = armijo_all[pick] & accepted
                jj = (pick + 1).astype(jnp.int32)
            else:
                def ls_cond(carry):
                    j, alpha, accepted, _ = carry
                    return (~accepted) & (j < opt.max_ls)

                def ls_body(carry):
                    j, alpha, _, _ = carry
                    ok_t, armijo_case = trial_ok(alpha)
                    return (
                        j + 1, jnp.where(ok_t, alpha, alpha * 0.5),
                        ok_t, armijo_case,
                    )

                j0 = (0, alpha_max, jnp.asarray(False), jnp.asarray(False))
                jj, alpha, accepted, armijo_case = jax.lax.while_loop(
                    ls_cond, ls_body, j0
                )

            # filter augmentation: whenever acceptance did not come from the
            # Armijo case, block this (theta, phi) region from future returns
            augment = accepted & ~armijo_case & ~in_resto
            slot_f = jnp.minimum(f_count, n_filter - 1)
            f_theta = jnp.where(
                augment,
                f_theta.at[slot_f].set((1.0 - opt.gamma_theta) * th0),
                f_theta,
            )
            f_phi = jnp.where(
                augment,
                f_phi.at[slot_f].set(phi0 - opt.gamma_phi * th0),
                f_phi,
            )
            f_count = jnp.where(augment, f_count + 1, f_count)

            w_new = w + alpha * dw
            # restoration leaves the original problem's equality duals alone
            # (its dlam solves the feasibility system, not the KKT system)
            lam_new = jnp.where(in_resto, lam, lam + alpha * dlam)
            zl_new = zl_d + alpha_dual * dzl_d
            zu_new = zu_d + alpha_dual * dzu_d

            # dual safeguard (IPOPT eq. 16)
            gl_n, gu_n = gaps(w_new)
            zl_new = jnp.where(
                has_lo,
                jnp.clip(zl_new, mu_u / (opt.kappa_sigma * gl_n), opt.kappa_sigma * mu_u / gl_n),
                0.0,
            )
            zu_new = jnp.where(
                has_up,
                jnp.clip(zu_new, mu_u / (opt.kappa_sigma * gu_n), opt.kappa_sigma * mu_u / gu_n),
                0.0,
            )

            bad = ~(jnp.all(jnp.isfinite(w_new)) & jnp.all(jnp.isfinite(lam_new)) & ok)
            w_new = jnp.where(bad, w, w_new)
            lam_new = jnp.where(bad, lam, lam_new)
            zl_new = jnp.where(bad, zl_d, zl_new)
            zu_new = jnp.where(bad, zu_d, zu_new)

            # barrier update
            err_parts, gjc_new = kkt_error_parts(w_new, lam_new, zl_new, zu_new)
            e_mu = error_from_parts(err_parts, mu_u)
            if probing:
                # the probe already chose this iteration's mu; carry it, and
                # flush the filter on big moves (entries store phi at old mu)
                mu_next = jnp.where(nb > 0, mu_u, mu)
                f_count = jnp.where(
                    (mu_next < 0.2 * mu) | (mu_next > 5.0 * mu), 0, f_count
                )
            elif opt.mu_strategy == "adaptive":
                # Adaptive barrier (reference parity: IPOPT runs
                # mu_strategy=adaptive, LpNLPSolver.cpp:28). LOQO/Vanderbei
                # centrality rule: mu tracks the average complementarity,
                # scaled down by how centered the iterate already is —
                # sigma = 0.1 * min(0.05 (1-xi)/xi, 2)^3, xi = min comp / avg.
                gl_a, gu_a = gaps(w_new)
                comp_l_a = jnp.where(has_lo, zl_new * gl_a, 0.0)
                comp_u_a = jnp.where(has_up, zu_new * gu_a, 0.0)
                avg_c = (jnp.sum(comp_l_a) + jnp.sum(comp_u_a)) / jnp.maximum(1.0, nb)
                cmin = jnp.minimum(
                    _masked_min(comp_l_a, has_lo), _masked_min(comp_u_a, has_up)
                )
                xi = cmin / jnp.maximum(avg_c, 1e-300)
                sigma_c = 0.1 * jnp.minimum(0.05 * (1.0 - xi) / jnp.maximum(xi, 1e-6), 2.0) ** 3
                mu_ad = jnp.clip(
                    sigma_c * avg_c, mu_min, jnp.asarray(opt.mu_init, dtype)
                )
                mu_next = jnp.where(nb > 0, mu_ad, mu)
                # filter entries store phi at the old mu: flush on big moves
                f_count = jnp.where(
                    (mu_next < 0.2 * mu) | (mu_next > 5.0 * mu), 0, f_count
                )
            else:
                # monotone Fiacco-McCormick: tighten once the barrier
                # subproblem is solved to kappa_eps * mu
                mu_next = jnp.where(
                    e_mu <= opt.kappa_eps * mu,
                    jnp.maximum(mu_min, jnp.minimum(opt.kappa_mu * mu, mu ** opt.theta_mu)),
                    mu,
                )
                # the filter is tied to phi_mu: reset on barrier updates (IPOPT does)
                f_count = jnp.where(mu_next != mu, 0, f_count)

            e_0 = error_from_parts(err_parts, jnp.zeros((), dtype))
            # theta at the accepted point from the carried constraint values
            # (gjc_new[2] is c(w_new) — no fresh transcription evaluation)
            th_new = jnp.sum(jnp.abs(gjc_new[2] - w_new[n:]))
            status_new = jnp.where(e_0 <= tol_eff, SOLVED, status)
            status_new = jnp.where(bad & (it > 2), FAILED, status_new)
            status_new = jnp.where(
                (it + 1 >= opt.max_iter) & (status_new == RUNNING), MAX_ITER, status_new
            )
            slot = jnp.minimum(it, hist["kkt"].shape[0] - 1)
            if opt.record_history:
                lin_err = jnp.max(jnp.abs(jv_(dz) - ds + r_p)) if m > 0 else jnp.zeros((), dtype)
                hist_new = {
                    "kkt": hist["kkt"].at[slot].set(e_0),
                    "mu": hist["mu"].at[slot].set(mu_u),
                    "alpha": hist["alpha"].at[slot].set(alpha),
                    "alpha_max": hist["alpha_max"].at[slot].set(alpha_max),
                    "delta_w": hist["delta_w"].at[slot].set(delta_used),
                    "theta": hist["theta"].at[slot].set(th_new),
                    "ls_iters": hist["ls_iters"].at[slot].set(jj),
                    "lin_err": hist["lin_err"].at[slot].set(lin_err),
                    "dphi": hist["dphi"].at[slot].set(dphi),
                    "step_inf": hist["step_inf"].at[slot].set(jnp.max(jnp.abs(dw))),
                    "reg_k": hist["reg_k"].at[slot].set(k),
                    "r0": hist["r0"].at[slot].set(reg_diag[0]),
                    "r_end": hist["r_end"].at[slot].set(reg_diag[1]),
                }
            else:
                hist_new = hist
            # boost the next regularization start after a failed line search:
            # the step direction was sound by the factorization's account but
            # useless in practice — damp the near-null directions next time
            delta_start_next = jnp.where(
                accepted,
                jnp.zeros((), dtype),
                jnp.maximum(opt.delta_w0, 10.0 * delta_used),
            )
            # Deadlock handling. Repeated line-search failures (high boosted
            # regularization OR a streak of rejected searches) mean the filter
            # has deadlocked. IPOPT enters its restoration phase here; so do
            # we, when the iterate is meaningfully INFEASIBLE: switch to
            # restoration mode (pure feasibility Gauss-Newton steps, see the
            # `in_resto` branches above) for up to `resto_max` iterations,
            # exiting early once theta has dropped by 10x. When the deadlock
            # happens while already (near-)feasible, restoration has nothing
            # to minimize — fall back to the soft re-centering (clear the
            # filter, reset the bound duals onto the central path, raise mu,
            # drop the regularization).
            # a "real" step moves: micro-alpha acceptances count as failures
            resto_max = jnp.asarray(
                opt.resto_max_iter if opt.restoration else 0, jnp.int32
            )
            real_step = accepted & (alpha >= 1e-3 * alpha_max)
            ls_fails = jnp.where(real_step, 0, ls_fails + 1)
            stuck = (~real_step) & (
                ((~accepted) & (delta_start >= opt.delta_w_stuck))
                | (ls_fails >= 8)
            )
            ls_fails = jnp.where(stuck, 0, ls_fails)
            # restoration exit: target met, iteration cap, or stuck inside it
            resto_target = jnp.maximum(0.1 * theta_entry, 0.01 * theta_min)
            exit_resto = in_resto & (
                (th_new <= resto_target) | (resto_left <= 1) | stuck
            )
            resto_next = jnp.where(
                exit_resto, 0, jnp.maximum(resto_left - 1, 0)
            )
            # Two consecutive unproductive restoration episodes (< 2x theta
            # reduction each) mean the iterate sits at an infeasible local
            # minimizer of ||c|| — IPOPT's "restoration phase failed" outcome.
            # Flag the instance FAILED instead of wandering.
            episode_failed = exit_resto & (th_new > 0.5 * theta_entry)
            resto_strikes = jnp.where(
                episode_failed, resto_strikes + 1,
                jnp.where(exit_resto, 0, resto_strikes),
            )
            status_new = jnp.where(
                (resto_strikes >= 2) & (status_new == RUNNING)
                & (th_new > 10.0 * theta_min),
                FAILED, status_new,
            )
            # restoration entry (only from normal mode, only if infeasible)
            enter_resto = (
                stuck & (~in_resto) & (th_new > 10.0 * theta_min)
                & jnp.asarray(opt.restoration)
            )
            resto_next = jnp.where(enter_resto, resto_max, resto_next)
            theta_entry = jnp.where(enter_resto, th_new, theta_entry)
            soft_restore = stuck & (~enter_resto) & (~in_resto)
            # during restoration mu is frozen (e_mu measures the original
            # problem and must not drive the barrier schedule)
            mu_next = jnp.where(in_resto & ~exit_resto, mu, mu_next)
            gl_n, gu_n = gaps(w_new)
            mu_next = jnp.where(
                soft_restore,
                jnp.maximum(mu, jnp.asarray(opt.mu_restore, dtype)), mu_next,
            )
            # the filter is cleared when entering restoration / soft-restoring
            # but NOT on restoration exit: the pre-entry filter still stands,
            # so the post-restoration iterate must be acceptable to it
            # (IPOPT's re-entry condition) — clearing it on exit lets a
            # freshly-unfiltered step undo the feasibility gain at once.
            f_count = jnp.where(soft_restore | enter_resto, 0, f_count)
            zl_new = jnp.where(soft_restore & has_lo, mu_next / gl_n, zl_new)
            zu_new = jnp.where(soft_restore & has_up, mu_next / gu_n, zu_new)
            delta_start_next = jnp.where(
                stuck, jnp.zeros((), dtype),
                jnp.minimum(delta_start_next, opt.delta_w_max),
            )
            return (w_new, lam_new, zl_new, zu_new, mu_next, delta_used, it + 1,
                    status_new, hist_new, f_theta, f_phi, f_count, delta_start_next,
                    gjc_new, e_0, ls_fails, resto_next, theta_entry, resto_strikes)

        def loop_cond(state):
            return state[7] == RUNNING

        slots = opt.max_iter if opt.record_history else 1
        hist0 = {
            k: jnp.zeros((slots,), dtype)
            for k in ("kkt", "mu", "alpha", "alpha_max", "delta_w", "theta",
                      "lin_err", "dphi", "step_inf", "r0", "r_end")
        }
        hist0["ls_iters"] = jnp.zeros((slots,), jnp.int32)
        hist0["reg_k"] = jnp.zeros((slots,), jnp.int32)
        parts0, gjc0 = kkt_error_parts(w0, lam0, zl_d0, zu_d0)
        e0_init = error_from_parts(parts0, jnp.zeros((), dtype))
        state0 = (
            w0, lam0, zl_d0, zu_d0, mu0,
            jnp.zeros((), dtype),              # delta_last
            jnp.asarray(0, jnp.int32),
            jnp.asarray(RUNNING, jnp.int32),
            hist0,
            jnp.zeros((n_filter,), dtype),                  # filter theta
            jnp.full((n_filter,), -jnp.inf, dtype),         # filter phi
            jnp.asarray(0, jnp.int32),                      # filter count
            jnp.zeros((), dtype),                           # delta_start
            gjc0,                                           # carried g/J/c
            e0_init,                                        # carried E_0
            jnp.asarray(0, jnp.int32),                      # ls failure streak
            jnp.asarray(0, jnp.int32),                      # restoration budget
            jnp.zeros((), dtype),                           # theta at resto entry
            jnp.asarray(0, jnp.int32),                      # failed-episode strikes
        )
        (w, lam, zl_d, zu_d, mu, delta_last, it, status, hist,
         _, _, _, _, _, e_final, _, _, _, _) = jax.lax.while_loop(
            loop_cond, step, state0
        )
        return IPMResult(
            z=w[:n], s=w[n:], lam=lam, zl_dual=zl_d, zu_dual=zu_d,
            status=status, iterations=it,
            objective=objective(w[:n]), kkt_error=e_final,
            mu=mu, delta_w=delta_last,
            history=hist if opt.record_history else None,
        )

    return solve
