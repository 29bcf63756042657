"""TPU A/B: single-stage f64 vs two-stage f32/f64 batch solver throughput."""
import sys

sys.path.insert(0, "/root/repo")
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import brachistochrone
from lpopc_tpu.parallel.batch import make_batch_solver

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
problem = brachistochrone.make_problem(degrees=(6, 6))
ipm = IPMOptions(tol=1e-8, max_iter=60)

rng = np.random.default_rng(0)
for ts in (False, True):
    bs = make_batch_solver(problem, SolveOptions(ipm=ipm), donate=False, two_stage=ts)
    z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
    pl = bs.nlp.layout.phases[0]
    npts, nx = pl.npts, pl.nx
    xf = slice(pl.var_offset + (npts - 1) * nx, pl.var_offset + (npts - 1) * nx + 2)
    vs = bs.scaled.var_scale[xf]
    pert = 0.2 * rng.uniform(-1, 1, (batch, 2)) * vs[None, :]
    zl[:, xf] += pert
    zu[:, xf] += pert
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
    frac = float(np.mean(st == SOLVED))
    print(json.dumps({
        "mode": "two_stage" if ts else "single_f64",
        "batch": batch,
        "solves_per_s": round(batch * frac / wall, 2),
        "solved_frac": round(frac, 4),
        "wall_s": round(wall, 4),
        "compile_s": round(compile_s, 1),
        "med_iters": int(np.median(np.asarray(res.iterations))),
        "max_iters": int(np.max(np.asarray(res.iterations))),
    }), flush=True)
