"""Driver surfaces: bench.py metric functions and __graft_entry__ hooks."""

import json
import sys

import numpy as np


def test_bench_mpc_metric():
    sys.path.insert(0, ".")
    import bench

    out = bench.bench_mpc(steps=5)
    assert out["metric"] == "mpc_p50_solve_ms"
    assert out["value"] > 0 and np.isfinite(out["value"])


def test_graft_entry_shapes():
    sys.path.insert(0, ".")
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    objs, statuses, kkts = out
    assert objs.shape == statuses.shape == kkts.shape == (8,)


def test_graft_dryrun_multichip():
    sys.path.insert(0, ".")
    import jax

    import __graft_entry__ as ge

    n = len(jax.devices())
    assert n == 8
    ge.dryrun_multichip(n)
