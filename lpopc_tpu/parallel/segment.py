"""Segment-axis sharding of ONE giant instance across a device mesh.

The reference's long-horizon story is serial: MUMPS exploits the banded
block sparsity of the transcribed NLP inside a single process
(``LpNLPSolver.cpp``; SURVEY §5 "long-context"). The TPU-native redesign
already factors the condensed KKT as S independent segment blocks plus a
small border Schur complement (:mod:`..core.block_kkt`,
:mod:`..core.kkt_blocks`) — which is exactly a depth-1 nested-dissection
partitioning. This module stretches that seam across chips:

* the ``(S, b, b)`` interior blocks, their batched Cholesky factors, and the
  per-segment assembly tensors are annotated with a ``PartitionSpec`` that
  shards the leading segment axis over a mesh axis (``seg``);
* XLA/GSPMD then partitions every batched-matmul stage of the factorization
  locally per chip and inserts ONE ``all-reduce`` (psum over ICI) for the
  border Schur assembly ``C - Σ_s B_s A_s⁻¹ B_sᵀ`` and one per solve for the
  border right-hand side — the only cross-segment couplings in the whole
  factorization;
* the small border system (size ``n_border`` ≈ S·nx) stays replicated.

This is the scaling-book recipe (mesh + shardings + let XLA place
collectives), not hand-written communication: no shard_map is needed because
every cross-segment contraction is already expressed as an einsum over the
segment axis.

The policy is installed while *tracing* the solver (sharding constraints are
baked into the jaxpr), so ``make_segment_solver`` wraps the whole build +
jit in :func:`segment_sharding`.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Optional[tuple] = None  # (mesh, axis_name)


@contextlib.contextmanager
def segment_sharding(mesh: Mesh, axis: str = "seg"):
    """Within this context, block-KKT code annotates its per-segment tensors
    with ``PartitionSpec(axis, None, ...)`` over ``mesh``. Trace the solver
    inside the context; outside it the hooks are free no-ops."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = prev


def seg_constrain(x):
    """Shard the leading (segment) axis of ``x`` when a policy is active.

    Called from :mod:`..core.block_kkt` / :mod:`..core.kkt_blocks` on every
    tensor whose first axis is the segment axis. Identity when no policy is
    installed (the common single-chip path) — with_sharding_constraint is
    never even traced then.
    """
    if _ACTIVE is None:
        return x
    mesh, axis = _ACTIVE
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def seg_replicated(x):
    """Pin ``x`` replicated across the segment mesh (border-system tensors).

    Explicitly marking the border factor replicated stops GSPMD from
    speculatively sharding the small dense Schur ops (all-to-all churn for
    matrices that fit in one core's VMEM)."""
    if _ACTIVE is None:
        return x
    mesh, _ = _ACTIVE
    spec = P(*([None] * x.ndim))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def segment_mesh(n_devices: int = None, axis: str = "seg", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_segment_solver(
    problem,
    options=None,
    mesh: Mesh = None,
    axis: str = "seg",
) -> Callable:
    """Compile a SINGLE-instance IPM solve with the KKT segment axis sharded
    over ``mesh``.

    Returns ``run() -> IPMResult`` solving the problem's transcribed NLP from
    its nominal guess/bounds. The factorization work — O(S·b³) batched
    Cholesky/inverse plus the per-segment O(S·deg²·b²) condensed-KKT assembly
    — partitions across the mesh; the border Schur system and the IPM state
    vector stay replicated (they are O(S·nx) and O(n) respectively, small
    next to the blocks).

    Use for single giant instances (fine meshes, thousands of collocation
    points) where one chip's HBM or FLOPs are the limit; for sweeps of many
    small instances use :func:`..parallel.batch.make_batch_solver`.
    """
    import dataclasses

    from ..core.ipm import build_solver
    from ..core.solve import SolveOptions, _kkt_structured
    from ..core.scaling import scale_nlp
    from ..core.transcribe import transcribe, const_mesh
    from ..core.kkt_blocks import bind_structured_kkt

    options = options or SolveOptions()
    if options.block_kkt == "auto":
        # sharding lives on the block path: engage it regardless of size
        options = dataclasses.replace(options, block_kkt="on")
    mesh = mesh or segment_mesh(axis=axis)
    nlp = transcribe(problem)
    scaled = scale_nlp(
        nlp.objective, nlp.constraints, nlp.zl, nlp.zu, nlp.cl, nlp.cu, nlp.z0,
        enabled=options.auto_scale, variable_scaling=options.variable_scaling,
        samples=options.scale_samples,
    )
    sk = _kkt_structured(problem, nlp, options)
    if sk is None:
        raise ValueError(
            "segment sharding requires the structured block-KKT path "
            "(options.block_kkt='on'/'auto' with >1 segment)"
        )

    with segment_sharding(mesh, axis):
        bound_sk = bind_structured_kkt(
            sk, const_mesh(nlp.ops), scaled.obj_scale,
            scaled.con_scale, 1.0 / scaled.var_scale,
        )
        solver = build_solver(
            scaled.objective, scaled.constraints, nlp.n, nlp.m,
            options.ipm_options(), structured_kkt=bound_sk,
        )
        jitted = jax.jit(solver)
        # trace + lower inside the context so the constraints are baked in
        z0 = jnp.asarray(scaled.z0)
        args = (
            z0, jnp.asarray(scaled.zl), jnp.asarray(scaled.zu),
            jnp.asarray(scaled.cl), jnp.asarray(scaled.cu),
        )
        lowered = jitted.lower(*args)
        compiled = lowered.compile()

    def run():
        return compiled(*args)

    run.nlp = nlp
    run.scaled = scaled
    run.mesh = mesh
    run.lowered = lowered
    run.compiled = compiled
    return run
