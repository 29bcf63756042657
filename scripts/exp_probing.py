"""A/B the Mehrotra-probing mu oracle vs monotone on the TPU bench config.

Usage: python scripts/exp_probing.py [batch]   (defaults 512; TPU by default)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(strategy, batch):
    import jax
    import jax.numpy as jnp

    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import brachistochrone
    from lpopc_tpu.parallel.batch import make_batch_solver

    problem = brachistochrone.make_problem(degrees=(6, 6))
    options = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60,
                                          mu_strategy=strategy))
    bs = make_batch_solver(problem, options, donate=False)
    rng = np.random.default_rng(0)
    z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
    pl = bs.nlp.layout.phases[0]
    npts, nx = pl.npts, pl.nx
    xf_rows = slice(pl.var_offset + (npts - 1) * nx,
                    pl.var_offset + (npts - 1) * nx + 2)
    vs = bs.scaled.var_scale[xf_rows]
    pert = 0.2 * rng.uniform(-1, 1, (batch, 2)) * vs[None, :]
    zl[:, xf_rows] += pert
    zu[:, xf_rows] += pert
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
    t0 = time.perf_counter()
    res = bs.run(*args)
    jax.block_until_ready(res.objective)
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = bs.run(*args)
        jax.block_until_ready(res.objective)
    wall = (time.perf_counter() - t0) / reps
    st = np.asarray(res.status)
    it = np.asarray(res.iterations)
    frac = float(np.mean(st == SOLVED))
    print({
        "strategy": strategy, "batch": batch,
        "solves_per_s": round(batch * frac / wall, 1),
        "solved_frac": round(frac, 4), "wall_s": round(wall, 4),
        "iters_p50": int(np.median(it)), "iters_max": int(it.max()),
        "compile_s": round(compile_s, 1),
    }, flush=True)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    for strategy in ("monotone", "probing"):
        run(strategy, batch)
