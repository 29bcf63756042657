"""Dump the optimized TPU HLO of the batched solver for while-loop forensics."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from lpopc_tpu.core.ipm import IPMOptions
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import brachistochrone
from lpopc_tpu.parallel.batch import make_batch_solver

problem = brachistochrone.make_problem(degrees=(6, 6))
ipm = IPMOptions(tol=1e-8, max_iter=60)
bs = make_batch_solver(problem, SolveOptions(ipm=ipm), donate=False)
batch = 512
z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
lam0 = jnp.zeros((batch, bs.m))

import jax

# the same vsolver is hard to reach; instead lower the public entry:
def entry(z0, zl, zu, cl, cu, lam0):
    return bs.run(z0, zl, zu, cl, cu, lam0)

lw = jax.jit(entry).lower(*args, lam0)
comp = lw.compile()
txt = comp.as_text()
open("/tmp/solver_hlo.txt", "w").write(txt)
print("bytes", len(txt), flush=True)
