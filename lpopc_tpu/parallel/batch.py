"""Instance-axis batching and multi-chip sharding of IPM solves.

The reference is strictly single-process/single-thread; its throughput story
is 1/wall-clock (SURVEY.md §5/§6). The TPU-native scale-out (BASELINE.json
north star) is an *instance axis*: thousands of perturbed problem instances
(different initial states, targets, pinned parameters) solve in lockstep —
``vmap`` across one chip's lanes, and a device-mesh sharding of the instance
grid across chips/hosts, with XLA inserting ICI/DCN collectives for the
cross-instance reductions.

Because the IPM takes its bounds as runtime inputs, a perturbed-instance sweep
is pure data parallelism: every instance shares the compiled solver; per-
instance ``status`` keeps diverged instances from poisoning the batch.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ipm import IPMOptions, build_solver
from ..core.problem import Problem
from ..core.scaling import scale_nlp
from ..core.solve import SolveOptions
from ..core.transcribe import transcribe


@dataclass
class BatchSolver:
    """A compiled batched solver for one problem family on a fixed mesh.

    ``run(z0, zl, zu, cl, cu)`` takes arrays with a leading batch axis and
    returns the batched :class:`IPMResult`. Use :meth:`nominal_inputs` to get
    broadcast-ready nominal arrays to perturb.
    """

    problem: Problem
    nlp: object
    scaled: object
    run: Callable
    n: int
    m: int

    def nominal_inputs(self, batch: int):
        s = self.scaled
        tile = lambda a: np.broadcast_to(np.asarray(a), (batch,) + np.asarray(a).shape).copy()
        return (tile(s.z0), tile(s.zl), tile(s.zu), tile(s.cl), tile(s.cu))

    def _pin_sensitivities(self, res, rows: slice):
        """dJ*/d(b) per instance for PINNED variables in ``rows`` — the
        envelope theorem: the optimum moves by ∂L/∂z_i db when an equality
        pin shifts, and for a fixed variable that multiplier is the reduced
        gradient (∇f + Jᵀλ)_i at the solution (the IPM masks fixed rows out
        of the bound-dual system entirely). One vmapped AD evaluation per
        call — no extra solves. NaN where the variable is not pinned."""
        if not hasattr(self, "_sens_fn"):
            import jax as _jax

            obj, con = self.nlp.objective, self.nlp.constraints

            def reduced_grad(z, lam):
                g = _jax.grad(obj)(z)
                _, vjp = _jax.vjp(con, z)
                return g + vjp(lam)[0]

            self._sens_fn = _jax.jit(_jax.vmap(reduced_grad))
        z_raw = np.asarray(res.z) / self.scaled.var_scale[None, :]
        lam_raw = np.asarray(res.lam) * (
            self.scaled.con_scale / self.scaled.obj_scale
        )[None, :]
        sens = np.asarray(self._sens_fn(z_raw, lam_raw))[:, rows]
        pinned = (self.nlp.zu[rows] - self.nlp.zl[rows]) < 1e-12
        return np.where(pinned[None, :], sens, np.nan)

    def x0_sensitivities(self, res, phase: int = 0):
        """(batch, nx) objective sensitivities dJ*/dx0 for pinned initial
        states — the MPC/value-function gradient, read off the duals."""
        pl = self.nlp.layout.phases[phase]
        return self._pin_sensitivities(
            res, slice(pl.var_offset, pl.var_offset + pl.nx)
        )

    def q_sensitivities(self, res, phase: int = 0):
        """(batch, nq) design sensitivities dJ*/dq for pinned static
        parameters (design variables frozen by equal bounds)."""
        pl = self.nlp.layout.phases[phase]
        return self._pin_sensitivities(res, pl.q_slice)

    def perturb_x0(self, batch: int, phase: int, deltas: np.ndarray):
        """Nominal inputs with the phase-``phase`` initial state shifted by
        ``deltas`` (batch, nx) — the canonical MPC/perturbation sweep input.

        Only states with equal lower/upper bounds (pinned x0) are shifted.
        """
        z0, zl, zu, cl, cu = self.nominal_inputs(batch)
        pl = self.nlp.layout.phases[phase]
        nx = pl.nx
        var_scale = self.scaled.var_scale[pl.var_offset : pl.var_offset + nx]
        d = np.asarray(deltas) * var_scale[None, :]
        sl = slice(pl.var_offset, pl.var_offset + nx)
        pinned = (zu[:, sl] - zl[:, sl]) < 1e-12
        zl[:, sl] = np.where(pinned, zl[:, sl] + d, zl[:, sl])
        zu[:, sl] = np.where(pinned, zu[:, sl] + d, zu[:, sl])
        # only shift the warm start where the bounds actually moved
        z0[:, sl] = np.where(pinned, z0[:, sl] + d, z0[:, sl])
        return z0, zl, zu, cl, cu


@contextlib.contextmanager
def _x64_disabled():
    """Demote to f32 for the ops traced inside this block (explicit
    save/restore: ``jax.enable_x64`` restores the process-start default, not
    the value set by ``jax.config.update`` at ``lpopc_tpu`` import).

    Also forces ``highest`` matmul precision: on TPU the default f32 matmul
    runs on the MXU in single-pass bf16 (~3 decimal digits), which is far too
    coarse for a Newton-KKT factorization — measured cholesky backward error
    at default precision is ~1e-2 on a cond~1e2 matrix. ``highest`` uses the
    multi-pass bf16 decomposition that recovers true f32 accuracy."""
    prev = jax.config.x64_enabled
    prev_prec = jax.config.jax_default_matmul_precision
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)
        jax.config.update("jax_default_matmul_precision", prev_prec)


def make_batch_solver(
    problem: Problem,
    options: SolveOptions = SolveOptions(),
    mesh: Optional[Mesh] = None,
    donate: bool = False,
    two_stage: bool = False,
    stage1_tol: float = 1e-3,
    stage1_max_iter: int = 40,
) -> BatchSolver:
    """Compile a vmapped (and optionally mesh-sharded) IPM solver.

    With ``mesh`` given (any axis names), the batch axis is sharded over all
    mesh axes — the multi-chip layout for instance sweeps; XLA partitions the
    whole lockstep solve with zero communication except final reductions.

    ``two_stage=True`` runs each instance through a **mixed-precision
    cascade**: stage 1 is the SAME interior-point method traced entirely in
    f32 (native TPU arithmetic — f64 is software-emulated and several times
    slower) down to ``stage1_tol``; stage 2 re-runs the f64 solver
    warm-started from stage 1's primal/dual point (z, λ, z_L/z_U, and μ from
    the carried complementarity) for the last few Newton iterations to the
    full tolerance. The f32 stage cannot run the endgame itself: near the
    solution the condensed K's condition number grows like O(1/μ) past
    f32's ~1/eps ≈ 1.7e7, and the factorization-divergence inertia test
    (correctly) rejects every step. SURVEY §7 hard-part 3 resolved: f32
    factorization + f64 refinement alone is not enough — the crossover must
    hand the whole iterate back to f64.
    """
    nlp = transcribe(problem)
    scaled = scale_nlp(
        nlp.objective, nlp.constraints, nlp.zl, nlp.zu, nlp.cl, nlp.cu, nlp.z0,
        enabled=options.auto_scale, variable_scaling=options.variable_scaling,
        samples=options.scale_samples,
    )
    jac_fn = hess_fn = None
    if getattr(options, "structured_derivatives", True):
        from ..core.structured import make_structured_hessian, make_structured_jacobian

        jac_fn, hess_fn = scaled.wrap_structured(
            make_structured_jacobian(problem, nlp.layout, nlp.ops),
            make_structured_hessian(problem, nlp.layout, nlp.ops),
        )
    from ..core.solve import _kkt_factorizer, _kkt_structured

    sk = _kkt_structured(problem, nlp, options)
    if sk is not None:
        from ..core.kkt_blocks import bind_structured_kkt
        from ..core.transcribe import const_mesh

        bound_sk = bind_structured_kkt(
            sk, const_mesh(nlp.ops), scaled.obj_scale,
            scaled.con_scale, 1.0 / scaled.var_scale,
        )
        kkt_fact = None
    else:
        bound_sk = None
        kkt_fact = _kkt_factorizer(nlp, options)
    ipm_base = options.ipm_options()
    if two_stage:
        ipm1 = replace(
            ipm_base, tol=stage1_tol, max_iter=stage1_max_iter,
            factor_dtype="f32", record_history=False,
        )
        ipm2 = replace(ipm_base, kappa_1=1e-8)
        solver1 = build_solver(
            scaled.objective, scaled.constraints, nlp.n, nlp.m, ipm1,
            jac_fn=jac_fn, hess_fn=hess_fn,
            kkt_factorizer=kkt_fact, structured_kkt=bound_sk,
        )
        solver2 = build_solver(
            scaled.objective, scaled.constraints, nlp.n, nlp.m, ipm2,
            jac_fn=jac_fn, hess_fn=hess_fn,
            kkt_factorizer=kkt_fact, structured_kkt=bound_sk,
        )

        def composed(z0, zl, zu, cl, cu, lam0):
            f32 = jnp.float32
            with _x64_disabled():
                r1 = solver1(
                    z0.astype(f32), zl.astype(f32), zu.astype(f32),
                    cl.astype(f32), cu.astype(f32), lam0.astype(f32),
                )
            f64 = z0.dtype
            r2 = solver2(
                r1.z.astype(f64), zl, zu, cl, cu, r1.lam.astype(f64),
                zl_d_init=r1.zl_dual.astype(f64),
                zu_d_init=r1.zu_dual.astype(f64),
            )
            return r2._replace(iterations=r1.iterations + r2.iterations)

        vsolver = jax.vmap(composed)
    else:
        solver = build_solver(
            scaled.objective, scaled.constraints, nlp.n, nlp.m, ipm_base,
            jac_fn=jac_fn, hess_fn=hess_fn,
            kkt_factorizer=kkt_fact, structured_kkt=bound_sk,
        )
        vsolver = jax.vmap(solver)
        # warm-dual variant (receding-horizon re-solves): carries the bound
        # duals z_L/z_U of the previous solve; the IPM then starts mu at the
        # carried complementarity instead of mu_init — typically 3-6
        # iterations instead of a cold ~15. Compiled lazily on first use.
        vsolver_warm = jax.vmap(
            lambda z0, zl, zu, cl, cu, lam0, zld, zud: solver(
                z0, zl, zu, cl, cu, lam0, zl_d_init=zld, zu_d_init=zud
            )
        )
    if mesh is not None:
        arg_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names), None))
        jitted = jax.jit(
            vsolver,
            in_shardings=(arg_sharding,) * 6,
            donate_argnums=(0,) if donate else (),
        )
        jitted_warm = None
    else:
        jitted = jax.jit(vsolver, donate_argnums=(0,) if donate else ())
        jitted_warm = (
            None if two_stage else jax.jit(vsolver_warm)
        )

    m_rows = nlp.m

    def run(z0, zl, zu, cl, cu, lam0=None, zl_d=None, zu_d=None):
        if lam0 is None:
            lam0 = jnp.zeros((z0.shape[0], m_rows), dtype=jnp.asarray(z0).dtype)
        if zl_d is not None:
            if jitted_warm is None:
                raise ValueError(
                    "warm bound duals are not supported with two_stage/mesh"
                )
            return jitted_warm(z0, zl, zu, cl, cu, lam0, zl_d, zu_d)
        return jitted(z0, zl, zu, cl, cu, lam0)

    return BatchSolver(
        problem=problem, nlp=nlp, scaled=scaled, run=run, n=nlp.n, m=nlp.m
    )


def default_mesh(axis_name: str = "dp", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def instance_grid_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    """2D mesh for large sweeps: the instance grid is sharded over both axes."""
    devices = devices if devices is not None else jax.devices()
    dev = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(dev, ("dp", "sp"))
