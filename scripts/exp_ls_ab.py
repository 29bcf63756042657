"""A/B: sequential vs parallel line search (+ optional adaptive mu) on the
bench config (batch-512 brachistochrone) — run on the TPU.

Usage: python scripts/exp_ls_ab.py [batch]
One process, runs serialized; each variant compiles (~60-120 s over the
tunnel) then times 3 reps.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import brachistochrone
    from lpopc_tpu.parallel.batch import make_batch_solver

    problem = brachistochrone.make_problem(degrees=(6, 6))
    variants = {
        "seq": IPMOptions(tol=1e-8, max_iter=60, ls_mode="sequential"),
        "par": IPMOptions(tol=1e-8, max_iter=60, ls_mode="parallel"),
        "par+adaptive": IPMOptions(
            tol=1e-8, max_iter=60, ls_mode="parallel", mu_strategy="adaptive"
        ),
    }
    rng = np.random.default_rng(0)
    for name, ipm in variants.items():
        bs = make_batch_solver(problem, SolveOptions(ipm=ipm))
        z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
        pl = bs.nlp.layout.phases[0]
        npts, nx = pl.npts, pl.nx
        xf_rows = slice(
            pl.var_offset + (npts - 1) * nx, pl.var_offset + (npts - 1) * nx + 2
        )
        vs = bs.scaled.var_scale[xf_rows]
        pert = 0.2 * rng.uniform(-1, 1, (batch, 2)) * vs[None, :]
        zl[:, xf_rows] += pert
        zu[:, xf_rows] += pert
        args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
        t0 = time.perf_counter()
        res = bs.run(*args)
        jax.block_until_ready(res.objective)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            res = bs.run(*args)
            jax.block_until_ready(res.objective)
        wall = (time.perf_counter() - t0) / reps
        st = np.asarray(res.status)
        it = np.asarray(res.iterations)
        print(
            f"{name:>14}: {batch * float(np.mean(st == SOLVED)) / wall:8.1f} "
            f"solves/s  wall={wall:.3f}s compile={compile_s:.0f}s "
            f"solved={float(np.mean(st == SOLVED)):.3f} "
            f"iters p50/max={int(np.median(it))}/{int(np.max(it))}",
            flush=True,
        )


if __name__ == "__main__":
    main()
