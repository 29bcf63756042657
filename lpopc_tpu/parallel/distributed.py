"""Multi-host (multi-process) instance-axis distribution.

SURVEY.md §5: the reference is strictly single-process; the TPU-native
scale-out story is ``jax.distributed`` across hosts with the instance grid
sharded over ALL devices of a slice — ICI within a host/pod, DCN between
hosts, with XLA inserting the (only) collectives for cross-instance
reductions. Because the batched IPM is pure data parallelism over instances,
the compiled program contains no cross-device communication at all: each
host feeds its local shard of the instance grid and reads back its local
shard of the results.

Usage (same program on every process):

    from lpopc_tpu.parallel import distributed as dist
    dist.initialize()                     # env-driven (or pass explicitly)
    mesh = dist.global_instance_mesh()
    bs = dist.make_distributed_batch_solver(problem, options, mesh)
    res = bs.run_local(z0_local, ...)     # per-process local shards in/out

Verified by a 2-process CPU test (``tests/test_distributed.py``) that runs
two coordinated processes with 4 virtual CPU devices each — the same
mechanism scales to multi-host TPU slices unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import Problem
from ..core.solve import SolveOptions
from .batch import BatchSolver, make_batch_solver

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the cross-process runtime (idempotent).

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) so launchers can stay generic;
    on cloud TPU slices ``jax.distributed.initialize()`` autodetects all
    three and this wrapper passes through. A single-process configuration is
    a no-op, so the same program runs unmodified on one host.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process: nothing to do
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def global_instance_mesh(axis_name: str = "dp") -> Mesh:
    """1D mesh over ALL devices of the slice (every process sees the same
    global device list after :func:`initialize`)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


@dataclass
class DistributedBatchSolver:
    """Wraps a mesh-sharded :class:`BatchSolver` with per-process local-shard
    input/output conversion."""

    inner: BatchSolver
    mesh: Mesh

    @property
    def nlp(self):
        return self.inner.nlp

    @property
    def scaled(self):
        return self.inner.scaled

    def local_batch_size(self, global_batch: int) -> int:
        nproc = jax.process_count()
        assert global_batch % nproc == 0, (
            f"global batch {global_batch} must divide process count {nproc}"
        )
        return global_batch // nproc

    def nominal_local_inputs(self, global_batch: int):
        """Per-process local shards of the nominal inputs (every process
        holds its own batch slice; perturb these locally)."""
        return self.inner.nominal_inputs(self.local_batch_size(global_batch))

    def _globalize(self, local_arrays, global_batch: int):
        sharding = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        out = []
        for a in local_arrays:
            a = np.asarray(a)
            gshape = (global_batch,) + a.shape[1:]
            out.append(
                jax.make_array_from_process_local_data(sharding, a, gshape)
            )
        return tuple(out)

    def run_local(self, z0, zl, zu, cl, cu, lam0=None):
        """Run the sharded solve from per-process local input shards; returns
        the per-process local shard of the batched IPMResult (numpy)."""
        nproc = jax.process_count()
        global_batch = z0.shape[0] * nproc
        args = self._globalize((z0, zl, zu, cl, cu), global_batch)
        if lam0 is None:
            lam0 = np.zeros((z0.shape[0], self.inner.m))
        (lam0_g,) = self._globalize((lam0,), global_batch)
        res = self.inner.run(*args, lam0=lam0_g)

        def localize(x):
            if not hasattr(x, "addressable_shards"):
                return np.asarray(x)
            shards = sorted(
                x.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

        return jax.tree_util.tree_map(localize, res)


def make_distributed_batch_solver(
    problem: Problem,
    options: SolveOptions = SolveOptions(),
    mesh: Optional[Mesh] = None,
    two_stage: bool = False,
) -> DistributedBatchSolver:
    """Mesh-sharded batch solver with local-shard IO (multi-host entry point).

    The instance axis is sharded over every device of every process; XLA
    compiles one SPMD program per process. There are no collectives in the
    solve itself — DCN traffic is zero until the caller reduces results.
    """
    mesh = mesh if mesh is not None else global_instance_mesh()
    inner = make_batch_solver(problem, options, mesh=mesh, two_stage=two_stage)
    return DistributedBatchSolver(inner=inner, mesh=mesh)
