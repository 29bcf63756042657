"""Worker for tests/test_hybrid.py: solves the UNSHARDED batch reference in
a fresh process.

The unsharded arm of the hybrid-equivalence test is compiled in a clean
process because XLA:CPU's compiler has segfaulted on this (large,
16-segment block-KKT) program when compiled late in a long-lived full-suite
process — isolation makes the reference robust to suite ordering and
accumulated compiler state. Usage: hybrid_reference_worker.py in.npz out.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    inp, outp = sys.argv[1], sys.argv[2]
    data = np.load(inp)
    from lpopc_tpu.core.ipm import IPMOptions
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import hypersensitive
    from lpopc_tpu.parallel.batch import make_batch_solver

    problem = hypersensitive.make_problem(
        tf=float(data["tf"]), degrees=tuple(int(d) for d in data["degrees"])
    )
    options = SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=60), mesh_method="none",
        block_kkt="on",
    )
    bs = make_batch_solver(problem, options)
    res = bs.run(data["z0"], data["zl"], data["zu"], data["cl"], data["cu"])
    np.savez(
        outp,
        status=np.asarray(res.status),
        objective=np.asarray(res.objective),
        z=np.asarray(res.z),
    )
    print("REFERENCE ok")


if __name__ == "__main__":
    main()
