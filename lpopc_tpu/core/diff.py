"""Differentiating THROUGH a converged solve (implicit function theorem).

The reference cannot do this at all: IPOPT returns a point, and the only
sensitivity story in reference-class tooling is a separate package
(sIPOPT). Here the whole solver is already a pure JAX function, so the
missing piece is the implicit-function-theorem VJP at the solution — with
it, an entire solve becomes a differentiable building block: design
optimization (∂traj*/∂design-bound), bilevel problems (outer optimizer over
inner OCPs), learning terminal costs, MPC policy gradients.

Math. At a converged primal-dual point ``v* = (z, s, λ)`` the smoothed KKT
residual (bound duals eliminated on the central path at the FINAL barrier
value μ — the same O(μ)-accurate generalized derivative used by
sIPOPT/OptNet/diffcp) is

    R(v; zl, zu, cl, cu) = [ ∇f + Jᵀλ − μ/(z−zl) + μ/(zu−z)
                             −λ − μ/(s−cl) + μ/(cu−s)
                             c(z) − s ]                          = 0,

with fixed rows (equal bounds — the pin mechanism every instance sweep
uses) replaced by the exact pin equation ``w_i − (lo_i+hi_i)/2 = 0``.
Then ``dv*/db = −(∂R/∂v)⁻¹ ∂R/∂b`` and the VJP needs ONE adjoint solve
with ``(∂R/∂v)ᵀ`` plus one AD vjp of R in the bounds — both assembled by
AD, both batched with vmap, both dense MXU work (the system is
(n+2m)² once per solve, not per iteration).

Everything here operates in the solver's SCALED space (the space of
``BatchSolver.run`` inputs/outputs and ``perturb_x0``); unscale with
``bs.scaled`` as usual.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .ipm import _INF_CUT

_FIXED_TOL = 1e-14


def make_kkt_residual(objective: Callable, constraints: Callable, n: int, m: int):
    """Smoothed-KKT residual ``R(v, zl, zu, cl, cu, mu) -> (n+2m,)`` for the
    scaled NLP (v = [z; s; lam])."""
    grad_f = jax.grad(objective)

    def residual(v, zl, zu, cl, cu, mu):
        z, s, lam = v[:n], v[n : n + m], v[n + m :]
        w = jnp.concatenate([z, s])
        wl = jnp.concatenate([zl, cl])
        wu = jnp.concatenate([zu, cu])
        fixed = (wu - wl) <= _FIXED_TOL
        has_lo = (wl > -_INF_CUT) & ~fixed
        has_up = (wu < _INF_CUT) & ~fixed
        gl = jnp.where(has_lo, w - wl, 1.0)
        gu = jnp.where(has_up, wu - w, 1.0)
        mu_term = -jnp.where(has_lo, mu / gl, 0.0) + jnp.where(has_up, mu / gu, 0.0)
        c_val = constraints(z)
        _, vjp_c = jax.vjp(constraints, z)
        r_z = grad_f(z) + vjp_c(lam)[0] + mu_term[:n]
        r_s = -lam + mu_term[n:]
        r_w = jnp.where(
            fixed, w - 0.5 * (wl + wu), jnp.concatenate([r_z, r_s])
        )
        r_c = c_val - s
        return jnp.concatenate([r_w, r_c])

    return residual


def solution_vjp(
    objective: Callable,
    constraints: Callable,
    n: int,
    m: int,
):
    """Build ``vjp(v_star, bounds, mu, ybar) -> (zl_bar, zu_bar, cl_bar,
    cu_bar)`` — the IFT adjoint for ONE instance (vmap for sweeps).

    ``ybar`` is the cotangent on ``v_star = [z; s; lam]`` (pad with zeros
    for outputs you don't differentiate).
    """
    residual = make_kkt_residual(objective, constraints, n, m)

    def vjp(v_star, zl, zu, cl, cu, mu, ybar):
        M = jax.jacfwd(residual)(v_star, zl, zu, cl, cu, mu)
        w = jnp.linalg.solve(M.T, ybar)
        _, pull = jax.vjp(
            lambda zl_, zu_, cl_, cu_: residual(v_star, zl_, zu_, cl_, cu_, mu),
            zl, zu, cl, cu,
        )
        return pull(-w)

    return vjp


class DifferentiableSolver:
    """A :class:`..parallel.batch.BatchSolver` wrapped as a JAX-differentiable
    function of its bound inputs.

    ``fn(z0, zl, zu, cl, cu) -> (z, s, lam, objective)`` supports
    ``jax.grad``/``jax.vjp`` with respect to ``zl, zu, cl, cu`` (the sweep
    parameters: pinned initial states, terminal targets, path-bound levels,
    pinned design parameters). The forward pass is the compiled batch IPM
    run; the backward pass is one batched KKT-adjoint solve at the solution
    (see module docstring). ``z0`` (the warm start) correctly receives a
    zero gradient — the converged solution does not depend on it.
    """

    def __init__(self, batch_solver):
        self.bs = batch_solver
        bs = batch_solver
        n, m = bs.n, bs.m
        obj = bs.scaled.objective
        con = bs.scaled.constraints
        inst_vjp = solution_vjp(obj, con, n, m)

        @jax.custom_vjp
        def fn(z0, zl, zu, cl, cu):
            res = bs.run(z0, zl, zu, cl, cu)
            return res.z, res.s, res.lam, res.objective

        def fwd(z0, zl, zu, cl, cu):
            res = bs.run(z0, zl, zu, cl, cu)
            out = (res.z, res.s, res.lam, res.objective)
            saved = (res.z, res.s, res.lam, zl, zu, cl, cu, res.mu)
            return out, saved

        def bwd(saved, cotangents):
            z, s, lam, zl, zu, cl, cu, mu = saved
            zbar, sbar, lambar, objbar = cotangents
            grad_obj = jax.vmap(jax.grad(obj))(z)
            # dJ/d(bounds) rides the z cotangent through ∇f(z*) djustment:
            # J(b) = f(z*(b)) ⇒ J̄ contributes objbar * ∇f(z*) to z̄.
            zbar = zbar + objbar[:, None] * grad_obj
            v_star = jnp.concatenate([z, s, lam], axis=1)
            ybar = jnp.concatenate([zbar, sbar, lambar], axis=1)
            zl_b, zu_b, cl_b, cu_b = jax.vmap(inst_vjp)(
                v_star, zl, zu, cl, cu, mu, ybar
            )
            z0_bar = jnp.zeros_like(z)
            return z0_bar, zl_b, zu_b, cl_b, cu_b

        fn.defvjp(fwd, bwd)
        self.fn = fn

    def __call__(self, z0, zl, zu, cl, cu):
        return self.fn(z0, zl, zu, cl, cu)


def make_differentiable_solver(problem, options=None, **kw) -> DifferentiableSolver:
    """Convenience: transcribe + compile + wrap (see
    :class:`DifferentiableSolver`)."""
    from ..parallel.batch import make_batch_solver
    from .solve import SolveOptions

    bs = make_batch_solver(problem, options or SolveOptions(), **kw)
    return DifferentiableSolver(bs)
