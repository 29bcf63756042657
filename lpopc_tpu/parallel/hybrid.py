"""Hybrid 2-D sharding: instance axis × segment axis on one device mesh.

The two scale-out stories compose (ROADMAP round-4 §3 / SURVEY §5):

* :mod:`.batch` shards a sweep of SMALL instances over every device — pure
  data parallelism, zero collectives in the solve;
* :mod:`.segment` shards ONE giant instance's block-KKT segment axis over
  the mesh — each interior-point iteration runs one ``psum`` for the border
  Schur assembly.

This module runs a *batch of giant instances* on a 2-D ``("dp", "seg")``
mesh: the instance axis shards over ``dp`` and every instance's KKT segment
tensors shard over ``seg``. On a multi-host TPU slice the natural layout
puts ``dp`` ACROSS hosts and ``seg`` WITHIN a host — the per-iteration
border-Schur all-reduce then rides ICI only (it reduces over ``seg``, which
never leaves the host), while the DCN carries zero solver traffic, exactly
the "collectives ride ICI, not DCN" rule from the scaling playbook.
:func:`hybrid_mesh` builds that layout by grouping each ``dp`` row from a
single process's local devices.

Mechanically this is one `jax.vmap(solver, spmd_axis_name="dp")`: the
sharding constraints that :func:`..parallel.segment.seg_constrain` bakes
into the block-KKT trace are rank-extended by vmap with the ``dp`` axis, so
a ``(S, b, b)`` annotation ``P('seg', None, None)`` becomes the batched
``P('dp', 'seg', None, None)`` without any hand-threading of specs. GSPMD
then partitions the batched segment-blocked Cholesky over the full mesh.

The reference has no analog (single process, one instance at a time —
SURVEY §5 "distributed backend: none").
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import Problem
from ..core.solve import SolveOptions
from .segment import segment_sharding


def hybrid_mesh(
    n_dp: Optional[int] = None,
    n_seg: Optional[int] = None,
    devices=None,
) -> Mesh:
    """2-D ``("dp", "seg")`` mesh with process-aligned rows.

    Defaults: ``dp`` = number of processes, ``seg`` = local devices per
    process, and devices are ordered so each ``dp`` row is one process's
    local devices — segment collectives stay intra-host (ICI), the
    instance axis spans hosts (DCN, no solver traffic).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = max(jax.process_count(), 1)
        if len(devices) % n_dp:
            n_dp = 1
    if n_seg is None:
        n_seg = len(devices) // n_dp
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices[: n_dp * n_seg], dtype=object).reshape(n_dp, n_seg)
    return Mesh(arr, ("dp", "seg"))


@dataclass
class HybridBatchSolver:
    """Compiled batch-of-giant-instances solver on a ``("dp","seg")`` mesh.

    ``run`` takes globally-shaped batched arrays (leading axis = instance,
    sharded over ``dp``); :meth:`run_local` takes/returns per-process local
    shards for multi-host programs (same convention as
    :class:`.distributed.DistributedBatchSolver`).
    """

    problem: Problem
    nlp: object
    scaled: object
    run: Callable
    mesh: Mesh
    n: int
    m: int
    lowered: object = None
    compiled: object = None

    def nominal_inputs(self, batch: int):
        s = self.scaled
        tile = lambda a: np.broadcast_to(
            np.asarray(a), (batch,) + np.asarray(a).shape
        ).copy()
        return (tile(s.z0), tile(s.zl), tile(s.zu), tile(s.cl), tile(s.cu))

    # -- multi-host local-shard IO ------------------------------------------
    def local_batch_size(self, global_batch: int) -> int:
        n_dp = self.mesh.shape["dp"]
        assert global_batch % n_dp == 0, (
            f"global batch {global_batch} must divide the dp axis {n_dp}"
        )
        per_row = global_batch // n_dp
        # process-aligned rows (hybrid_mesh): count this process's dp rows
        n_local_rows = sum(
            1 for d in self.mesh.devices[:, 0]
            if d.process_index == jax.process_index()
        )
        return per_row * n_local_rows

    def nominal_local_inputs(self, global_batch: int):
        return self.nominal_inputs(self.local_batch_size(global_batch))

    def run_local(self, z0, zl, zu, cl, cu, lam0=None):
        """Per-process local instance shards in, local result shards out."""
        sharding = NamedSharding(self.mesh, P("dp", None))
        n_dp = self.mesh.shape["dp"]
        local_rows = sum(
            1 for d in self.mesh.devices[:, 0]
            if d.process_index == jax.process_index()
        )
        global_batch = z0.shape[0] * n_dp // max(local_rows, 1)
        if lam0 is None:
            lam0 = np.zeros((z0.shape[0], self.m))

        def globalize(a):
            a = np.asarray(a)
            return jax.make_array_from_process_local_data(
                sharding, a, (global_batch,) + a.shape[1:]
            )

        res = self.run(*map(globalize, (z0, zl, zu, cl, cu, lam0)))

        def localize(x):
            if not hasattr(x, "addressable_shards"):
                return np.asarray(x)
            seen = {}
            for s in x.addressable_shards:
                seen[s.index[0].start or 0] = np.asarray(s.data)
            return np.concatenate(
                [seen[k] for k in sorted(seen)], axis=0
            )

        return jax.tree_util.tree_map(localize, res)


def make_hybrid_batch_solver(
    problem: Problem,
    options: SolveOptions = SolveOptions(),
    mesh: Optional[Mesh] = None,
) -> HybridBatchSolver:
    """Compile the 2-D instance×segment sharded batch solver.

    Requires the structured block-KKT path (``block_kkt='on'``/``'auto'``
    with more than one segment) — the segment axis is the thing being
    sharded. The instance axis rides ``jax.vmap(..., spmd_axis_name='dp')``
    so every internal segment-sharding constraint is automatically extended
    with the batch dimension.
    """
    from ..core.ipm import build_solver
    from ..core.kkt_blocks import bind_structured_kkt
    from ..core.scaling import scale_nlp
    from ..core.solve import _kkt_structured
    from ..core.structured import (
        make_structured_hessian,
        make_structured_jacobian,
    )
    from ..core.transcribe import const_mesh, transcribe

    options = options or SolveOptions()
    if options.block_kkt == "auto":
        options = dataclasses.replace(options, block_kkt="on")
    mesh = mesh if mesh is not None else hybrid_mesh()
    if set(mesh.axis_names) != {"dp", "seg"}:
        raise ValueError(
            f"hybrid solver needs a ('dp','seg') mesh, got {mesh.axis_names}"
        )
    nlp = transcribe(problem)
    scaled = scale_nlp(
        nlp.objective, nlp.constraints, nlp.zl, nlp.zu, nlp.cl, nlp.cu, nlp.z0,
        enabled=options.auto_scale, variable_scaling=options.variable_scaling,
        samples=options.scale_samples,
    )
    sk = _kkt_structured(problem, nlp, options)
    if sk is None:
        raise ValueError(
            "hybrid instance×segment sharding requires the structured "
            "block-KKT path (options.block_kkt='on'/'auto' with >1 segment)"
        )
    jac_fn = hess_fn = None
    if options.structured_derivatives:
        jac_fn, hess_fn = scaled.wrap_structured(
            make_structured_jacobian(problem, nlp.layout, nlp.ops),
            make_structured_hessian(problem, nlp.layout, nlp.ops),
        )

    with segment_sharding(mesh, "seg"):
        bound_sk = bind_structured_kkt(
            sk, const_mesh(nlp.ops), scaled.obj_scale,
            scaled.con_scale, 1.0 / scaled.var_scale,
        )
        solver = build_solver(
            scaled.objective, scaled.constraints, nlp.n, nlp.m,
            options.ipm_options(),
            jac_fn=jac_fn, hess_fn=hess_fn, structured_kkt=bound_sk,
        )
        vsolver = jax.vmap(solver, spmd_axis_name="dp")
        arg_sharding = NamedSharding(mesh, P("dp", None))
        jitted = jax.jit(vsolver, in_shardings=(arg_sharding,) * 6)

    m_rows = nlp.m

    def run(z0, zl, zu, cl, cu, lam0=None):
        if lam0 is None:
            lam0 = jnp.zeros((z0.shape[0], m_rows), dtype=jnp.asarray(z0).dtype)
        # trace/compile must happen under the policy so the segment
        # constraints are baked in (first call compiles)
        with segment_sharding(mesh, "seg"):
            return jitted(z0, zl, zu, cl, cu, lam0)

    hb = HybridBatchSolver(
        problem=problem, nlp=nlp, scaled=scaled, run=run, mesh=mesh,
        n=nlp.n, m=nlp.m,
    )

    def _lower(batch: int):
        args = tuple(jnp.asarray(a) for a in hb.nominal_inputs(batch)) + (
            jnp.zeros((batch, m_rows)),
        )
        with segment_sharding(mesh, "seg"):
            hb.lowered = jitted.lower(*args)
            hb.compiled = hb.lowered.compile()
        return hb.compiled

    hb.lower = _lower
    return hb
