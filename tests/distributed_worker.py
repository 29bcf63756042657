"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_distributed.py with JAX_PROCESS_ID/JAX_NUM_PROCESSES/
JAX_COORDINATOR_ADDRESS set and 4 virtual CPU devices per process. Solves a
16-instance perturbed brachistochrone sweep sharded over the 8 global
devices and prints a checksum line the test compares across processes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import brachistochrone
from lpopc_tpu.parallel import distributed as dist


def main():
    dist.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = dist.global_instance_mesh()
    problem = brachistochrone.make_problem(degrees=(6, 6))
    options = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60))
    bs = dist.make_distributed_batch_solver(problem, options, mesh)

    global_batch = 16
    z0, zl, zu, cl, cu = bs.nominal_local_inputs(global_batch)
    # deterministic per-process perturbation of the pinned terminal point
    pid = jax.process_index()
    rng = np.random.default_rng(42 + pid)
    pl = bs.nlp.layout.phases[0]
    npts, nx = pl.npts, pl.nx
    xf = slice(pl.var_offset + (npts - 1) * nx, pl.var_offset + (npts - 1) * nx + 2)
    vs = bs.scaled.var_scale[xf]
    pert = 0.1 * rng.uniform(-1, 1, (z0.shape[0], 2)) * vs[None, :]
    zl[:, xf] += pert
    zu[:, xf] += pert
    res = bs.run_local(z0, zl, zu, cl, cu)
    st = np.asarray(res.status)
    ok = bool(np.all(st == SOLVED))
    print(
        f"WORKER {pid} ok={ok} nlocal={st.shape[0]} "
        f"objsum={float(np.sum(res.objective)):.12f}",
        flush=True,
    )
    # cross-process agreement on a reduced quantity via a collective
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    obj_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), np.asarray(res.objective),
        (global_batch,),
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(obj_g)
    print(f"WORKER {pid} globalsum={float(total):.12f}", flush=True)

    # Segment-sharded giant instance ACROSS the process boundary: the
    # 16-segment block-KKT spans both processes' devices, so the border
    # Schur all-reduce crosses the inter-process link (the DCN analog).
    from lpopc_tpu.models import hypersensitive
    from lpopc_tpu.parallel.segment import make_segment_solver, segment_mesh

    seg_run = make_segment_solver(
        hypersensitive.make_problem(tf=40.0, degrees=(6,) * 16),
        SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60),
                     mesh_method="none", block_kkt="on"),
        mesh=segment_mesh(),      # all 8 global devices
    )
    seg_res = seg_run()
    print(
        f"WORKER {pid} seg_status={int(seg_res.status)} "
        f"seg_obj={float(seg_res.objective):.12f}",
        flush=True,
    )

    # Hybrid 2-D: instance axis ACROSS the two processes (the DCN analog,
    # zero solver traffic), segment axis WITHIN each process's 4 local
    # devices (the ICI analog — carries the border-Schur all-reduce).
    from lpopc_tpu.parallel.hybrid import hybrid_mesh, make_hybrid_batch_solver

    hmesh = hybrid_mesh()
    assert hmesh.shape == {"dp": 2, "seg": 4}, hmesh.shape
    # each dp row must be one process's local devices (ICI-aligned layout)
    for row in range(2):
        owners = {d.process_index for d in hmesh.devices[row]}
        assert len(owners) == 1, f"dp row {row} spans processes {owners}"
    hb = make_hybrid_batch_solver(
        hypersensitive.make_problem(tf=40.0, degrees=(6,) * 16),
        SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60),
                     mesh_method="none", block_kkt="on"),
        mesh=hmesh,
    )
    hz0, hzl, hzu, hcl, hcu = hb.nominal_local_inputs(4)
    assert hz0.shape[0] == 2, hz0.shape  # 2 local instances per process
    hres = hb.run_local(hz0, hzl, hzu, hcl, hcu)
    hst = np.asarray(hres.status)
    hok = bool(np.all(hst == SOLVED))
    print(
        f"WORKER {pid} hybrid_ok={hok} "
        f"hybrid_objsum={float(np.sum(hres.objective)):.12f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
