"""Receding-horizon (MPC) driver over the batched IPM solver.

No counterpart exists in the reference (single offline solves only); this is
the BASELINE.json "p50 receding-horizon solve ms" capability: a compiled
fixed-mesh solver is reused every control step with the measured state pinned
into the initial-state bounds and the previous solution as warm start, over a
single instance or a whole batch of plants in lockstep.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ipm import IPMOptions, SOLVED
from ..core.problem import Problem
from ..core.solve import SolveOptions
from .batch import BatchSolver, make_batch_solver


@dataclass
class MPCController:
    """Compiled receding-horizon controller.

    ``step(x0)`` takes the measured state(s) (nx,) or (B, nx) of phase 0 and
    returns (u0, info): the first control(s) and solver diagnostics. The
    horizon is the problem's time window; states with pinned x0 bounds are
    overwritten by the measurement.
    """

    problem: Problem
    options: SolveOptions = None
    batch: int = 1
    warm_mu: float = 1e-2

    def __post_init__(self):
        opts = self.options or SolveOptions()
        if opts.ipm is None:
            opts = SolveOptions(
                **{**opts.__dict__, "ipm": IPMOptions(
                    tol=opts.tol, max_iter=opts.max_iterations, mu_init=self.warm_mu
                )}
            )
        self.bs: BatchSolver = make_batch_solver(self.problem, opts)
        self._z_prev = None
        self._lam_prev = None
        self.solve_times = []

    def step(self, x0):
        x0 = np.atleast_2d(np.asarray(x0, dtype=np.float64))
        B = x0.shape[0]
        pl = self.bs.nlp.layout.phases[0]
        sl = slice(pl.var_offset, pl.var_offset + pl.nx)
        vs = self.bs.scaled.var_scale[sl]
        # the measurement replaces the PINNED initial-state bounds; the
        # nominal is those bounds' value (not the guess, which need not match)
        pinned = (self.bs.scaled.zu[sl] - self.bs.scaled.zl[sl]) < 1e-12
        nominal_x0 = np.where(pinned, self.bs.scaled.zl[sl] / vs, 0.0)
        deltas = np.where(pinned[None, :], x0 - nominal_x0[None, :], 0.0)
        z0, zl, zu, cl, cu = self.bs.perturb_x0(B, 0, deltas)
        if self._z_prev is not None and self._z_prev.shape[0] == B:
            z0 = np.array(self._z_prev)
            # re-pin only the measured (pinned) initial states in the warm start
            z0[:, sl] = np.where(pinned[None, :], zl[:, sl], z0[:, sl])
        lam0 = (
            jnp.asarray(self._lam_prev)
            if self._lam_prev is not None and self._lam_prev.shape[0] == B
            else jnp.zeros((B, self.bs.m))
        )
        t0 = time.perf_counter()
        res = self.bs.run(*(jnp.asarray(a) for a in (z0, zl, zu, cl, cu)), lam0)
        jax.block_until_ready(res.z)
        self.solve_times.append(time.perf_counter() - t0)
        self._z_prev = np.asarray(res.z)
        self._lam_prev = np.asarray(res.lam)
        u_off = pl.var_offset + pl.npts * pl.nx
        u0 = self._z_prev[:, u_off : u_off + pl.nu] / \
            self.bs.scaled.var_scale[u_off : u_off + pl.nu][None, :]
        info = {
            "status": np.asarray(res.status),
            "iterations": np.asarray(res.iterations),
            "objective": np.asarray(res.objective) / self.bs.scaled.obj_scale,
            "kkt_error": np.asarray(res.kkt_error),  # scaled-problem residual
        }
        return (u0[0] if x0.shape[0] == 1 and self.batch == 1 else u0), info

    def percentile_ms(self, q=50):
        times = self.solve_times[1:] or self.solve_times  # drop compile step
        return float(np.percentile(np.array(times) * 1e3, q)) if times else float("nan")
