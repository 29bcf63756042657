"""Round-2 feature tests: apply-mode/f32 factorization, adaptive barrier,
warm bound duals across grids, per-grid iteration logs."""

import os

import numpy as np
import pytest

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions, solve, solve_on_mesh
from lpopc_tpu.models import brachistochrone, hypersensitive


def _brach_sol(ipm_kw=None, **kw):
    ipm_kw = dict(ipm_kw or {})
    ipm_kw.setdefault("tol", 1e-8)
    ipm_kw.setdefault("max_iter", 100)
    opts = SolveOptions(mesh_method="none", ipm=IPMOptions(**ipm_kw), **kw)
    return solve(brachistochrone.make_problem(degrees=(6, 6)), opts)


def test_inverse_mode_matches_cho_solve_path():
    """The apply-mode factorization (L^{-1} formed once, solves as matvecs)
    must reproduce the cho_solve path bit-for-purpose (same solution)."""
    s_inv = _brach_sol()                                # n < 600 -> inverse mode
    s_cho = _brach_sol(ipm_kw={"inverse_threshold": 0})  # forces cho_solve
    assert s_inv.status == SOLVED and s_cho.status == SOLVED
    assert abs(s_inv.objective - s_cho.objective) < 1e-9
    np.testing.assert_allclose(s_inv.z, s_cho.z, atol=1e-7)


def test_f32_factorization_converges_to_stage1_tolerance():
    """f32 Cholesky + f64 iterative refinement (SURVEY §7 hard-part 3).

    Round-2 finding: the refinement recovers f64 STEP accuracy only while
    cond(K) stays within f32 range; near the barrier endgame cond(K) grows
    like O(1/mu) past 1/eps_f32 ~ 1.7e7 and the refinement (correctly)
    diverges, so f32 factorization is specified as the STAGE-1 mechanism of
    the two-stage cascade (parallel/batch.py) and validated to its stage-1
    tolerance here — the full-accuracy path is test_two_stage.py."""
    s32 = _brach_sol(ipm_kw={"factor_dtype": "f32", "tol": 1e-4})
    s64 = _brach_sol()
    assert s32.status == SOLVED
    assert s32.kkt_error <= 1e-4
    assert abs(s32.objective - s64.objective) < 1e-4


def test_adaptive_mu_converges_and_wins_on_hard_mesh():
    """Reference parity (IPOPT mu_strategy=adaptive): same answer, and
    measurably fewer iterations on the fine hypersensitive mesh (measured
    r2: 8 vs 9 iters here; 14 vs 18 on the 4-phase launch)."""
    s_ad = _brach_sol(ipm_kw={"mu_strategy": "adaptive"})
    s_mono = _brach_sol()
    assert s_ad.status == SOLVED
    assert abs(s_ad.objective - s_mono.objective) < 1e-7

    problem = hypersensitive.make_problem(tf=40.0, degrees=(8,) * 12)
    h_ad = solve_on_mesh(problem, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=200, mu_strategy="adaptive")))
    h_mono = solve_on_mesh(problem, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=200)))
    assert h_ad.status == SOLVED and h_mono.status == SOLVED
    assert abs(h_ad.objective - h_mono.objective) < 1e-7
    assert h_ad.iterations <= h_mono.iterations


def test_warm_bound_duals_reduce_iterations(monkeypatch):
    """Grids >= 2 warm-start z_L/z_U (and mu from the carried complementarity);
    knocking the mechanism out must not reduce the grid-2 iteration count."""
    import lpopc_tpu.core.solve as solve_mod

    problem = hypersensitive.make_problem(tf=40.0, degrees=(8,) * 4)
    opts = SolveOptions(tol=1e-8, max_grid_num=3, desired_relative_error=1e-7,
                        verbose=False)

    iters_warm = []
    orig = solve_mod.extract_solution

    def capture(*a, **kw):
        s = orig(*a, **kw)
        iters_warm.append(s.iterations)
        return s

    monkeypatch.setattr(solve_mod, "extract_solution", capture)
    sol_w = solve(problem, opts)
    warm_counts = list(iters_warm)

    iters_cold = []
    monkeypatch.setattr(
        solve_mod, "_warm_bound_duals", lambda *a, **kw: (None, None)
    )

    def capture2(*a, **kw):
        s = orig(*a, **kw)
        iters_cold.append(s.iterations)
        return s

    monkeypatch.setattr(solve_mod, "extract_solution", capture2)
    sol_c = solve(problem, opts)
    assert sol_w.solved and sol_c.solved
    assert abs(sol_w.objective - sol_c.objective) < 1e-6
    # total post-first-grid iterations with warm duals <= without
    assert sum(warm_counts[1:]) <= sum(iters_cold[1:])


def test_iteration_log_files(tmp_path):
    d = str(tmp_path / "logs")
    problem = hypersensitive.make_problem(tf=40.0, degrees=(8,) * 4)
    sol = solve(problem, SolveOptions(
        tol=1e-8, max_grid_num=2, iteration_log_dir=d))
    assert sol.solved
    f1 = os.path.join(d, "grid-1-ipm-out.txt")
    assert os.path.exists(f1)
    lines = open(f1).read().splitlines()
    assert lines[0].startswith("# lpopc_tpu IPM trace")
    assert len(lines) >= 3 + 2  # header + columns + some iterations
    # kkt column of the last row is at the solver tolerance
    last = lines[-1].split()
    assert float(last[1]) >= 0.0
