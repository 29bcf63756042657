"""TPU throughput experiment: batched brachistochrone sweep under IPM
variants (apply-mode factorization, f32 factor + f64 refine, adaptive mu),
plus an optional jax.profiler trace of the winning config.

Run ON THE TPU (no JAX_PLATFORMS override), one process at a time:

    python scripts/profile_tpu.py [batch] [--trace]

Prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(name, batch, ipm_kw, trace_dir=None):
    import jax
    import jax.numpy as jnp

    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import brachistochrone
    from lpopc_tpu.parallel.batch import make_batch_solver

    problem = brachistochrone.make_problem(degrees=(6, 6))
    options = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60, **ipm_kw))
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

    if trace_dir:
        from lpopc_tpu.utils.trace import device_profile

        with device_profile(trace_dir):
            res = bs.run(*args)
            jax.block_until_ready(res.objective)

    statuses = np.asarray(res.status)
    frac = float(np.mean(statuses == SOLVED))
    out = {
        "variant": name,
        "batch": batch,
        "solves_per_s": round(batch * frac / wall, 2),
        "solved_frac": round(frac, 4),
        "mean_iters": round(float(np.mean(np.asarray(res.iterations))), 1),
        "wall_s": round(wall, 4),
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out), flush=True)
    return out


VARIANTS = {
    "baseline_r1": dict(inverse_threshold=0),            # round-1 behavior
    "inverse": dict(),                                   # apply-mode (new default)
    "inverse_f32": dict(factor_dtype="f32"),
    "inverse_f32_adaptive": dict(factor_dtype="f32", mu_strategy="adaptive"),
    "adaptive": dict(mu_strategy="adaptive"),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 512
    trace = "--trace" in sys.argv
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    results = []
    for name, kw in VARIANTS.items():
        if only and name not in only:
            continue
        results.append(run_variant(name, batch, kw))
    if trace and results:
        best = max(results, key=lambda r: r["solves_per_s"])
        print(f"# tracing best variant: {best['variant']}", flush=True)
        run_variant(best["variant"], batch, VARIANTS[best["variant"]],
                    trace_dir="/tmp/lpopc_tpu_trace")


if __name__ == "__main__":
    main()
