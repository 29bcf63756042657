"""Throughput experiment: f64 vs f32-factorize vs full-f32 IPM on TPU."""
import sys; sys.path.insert(0, "/root/repo")
import json, sys, time
import numpy as np
import jax
import jax.numpy as jnp

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import brachistochrone
from lpopc_tpu.parallel.batch import make_batch_solver

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mode = sys.argv[2] if len(sys.argv) > 2 else "f32factor"

problem = brachistochrone.make_problem(degrees=(6, 6))
if mode == "f32factor":
    ipm = IPMOptions(tol=1e-8, max_iter=60, factor_dtype="f32")
elif mode == "fullf32":
    ipm = IPMOptions(tol=2e-5, max_iter=60, factor_dtype="f32")
elif mode == "f64":
    ipm = IPMOptions(tol=1e-8, max_iter=60)
options = SolveOptions(ipm=ipm)
bs = make_batch_solver(problem, options, donate=False)

rng = np.random.default_rng(0)
z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
pl = bs.nlp.layout.phases[0]
npts, nx = pl.npts, pl.nx
xf_rows = slice(pl.var_offset + (npts - 1) * nx, pl.var_offset + (npts - 1) * nx + 2)
vs = bs.scaled.var_scale[xf_rows]
pert = 0.2 * rng.uniform(-1, 1, (batch, 2)) * vs[None, :]
zl[:, xf_rows] += pert
zu[:, xf_rows] += pert
dt = jnp.float32 if mode == "fullf32" else jnp.float64
args = tuple(jnp.asarray(a, dtype=dt) for a in (z0, zl, zu, cl, cu))

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
statuses = np.asarray(res.status)
frac = float(np.mean(statuses == SOLVED))
print(json.dumps({
    "mode": mode, "batch": batch,
    "solves_per_s": round(batch * frac / wall, 2),
    "solved_frac": round(frac, 4), "wall_s": round(wall, 4),
    "compile_s": round(compile_s, 1),
    "median_iters": int(np.median(np.asarray(res.iterations))),
    "max_kkt": float(np.max(np.asarray(res.kkt_error))),
}))
