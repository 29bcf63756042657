"""Attempt a jax.profiler device trace of the batched IPM on the TPU."""
import sys

sys.path.insert(0, "/root/repo")
import time

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
res = bs.run(*args)
jax.block_until_ready(res.objective)
print("warm", flush=True)

from lpopc_tpu.utils.trace import device_profile

with device_profile("/tmp/jaxprof"):
    res = bs.run(*args)
    jax.block_until_ready(res.objective)
print("profiled", flush=True)
