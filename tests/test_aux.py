"""Auxiliary subsystems: result files, checkpoint/resume, scaling, refinement units."""

import os

import jax.numpy as jnp
import numpy as np

from lpopc_tpu.core.problem import Phase, Problem
from lpopc_tpu.core.refine import ph_refine_phase
from lpopc_tpu.core.scaling import scale_nlp
from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.core.transcribe import transcribe
from lpopc_tpu.models import moonlander
from lpopc_tpu.utils.checkpoint import resume_problem, save_checkpoint
from lpopc_tpu.utils.resultfiles import save_results


def _solved_moonlander():
    return solve(moonlander.make_problem(degrees=(4, 4)), SolveOptions(mesh_method="none"))


def test_result_files(tmp_path):
    sol = _solved_moonlander()
    paths = save_results(sol, str(tmp_path))
    names = {os.path.basename(p) for p in paths}
    for want in ("time1.dat", "state1.dat", "control1.dat", "costate1.dat",
                 "Hamiltonian1.dat", "parameter1.dat", "summary.txt"):
        assert want in names
    t = np.loadtxt(tmp_path / "time1.dat")
    x = np.loadtxt(tmp_path / "state1.dat")
    assert t.size == x.shape[0] == 9  # 2 segments x degree 4 + endpoint
    u = np.loadtxt(tmp_path / "control1.dat")
    assert u.shape[0] == t.size  # control extended to the endpoint


def test_checkpoint_resume_roundtrip(tmp_path):
    prob = moonlander.make_problem(degrees=(4, 4))
    sol = solve(prob, SolveOptions(mesh_method="none"))
    save_checkpoint(sol, prob, str(tmp_path), grid=1)
    prob2, grid = resume_problem(moonlander.make_problem(degrees=(4, 4)), str(tmp_path))
    assert grid == 1
    ph = prob2.phases[0]
    assert tuple(ph.mesh_degrees) == (4, 4)
    # resumed guess reproduces the checkpointed trajectory
    np.testing.assert_allclose(ph.guess_x, sol.phases[0].x, atol=1e-12)
    # a resumed solve warm-starts and converges quickly
    sol2 = solve(prob2, SolveOptions(mesh_method="none"))
    assert sol2.solved
    assert abs(sol2.objective - sol.objective) < 1e-6


def test_resume_without_checkpoint(tmp_path):
    prob = moonlander.make_problem()
    prob2, grid = resume_problem(prob, str(tmp_path))
    assert grid == 0 and prob2 is prob


def test_gradient_scaling():
    # objective with a huge gradient gets scaled down to g_max
    obj = lambda z: 1e6 * jnp.sum(z**2)
    con = lambda z: jnp.array([1e4 * z[0], 1e-3 * z[1]])
    z0 = np.array([1.0, 1.0])
    s = scale_nlp(obj, con, np.full(2, -10.0), np.full(2, 10.0),
                  np.zeros(2), np.ones(2), z0)
    g = np.asarray(jnp.asarray(jnp.max(jnp.abs(jnp.array([2e6, 2e6])))) * s.obj_scale)
    assert g <= 1.0 + 1e-9
    assert s.con_scale[0] <= 1e-3
    assert s.con_scale[1] == 1.0  # small rows are never scaled UP
    # unscaling lambdas inverts the scaling relation
    lam_scaled = np.array([2.0, 3.0])
    lam = s.unscale_lam(lam_scaled)
    np.testing.assert_allclose(lam, lam_scaled * s.con_scale / s.obj_scale)


def test_ph_refine_logic():
    # satisfied segment untouched; moderate error raises degree; huge error splits
    d, f, ok = ph_refine_phase((6, 6, 6), (-1.0, 0.0, 0.5, 1.0),
                               np.array([1e-8, 1e-4, 1e2]), 1e-6, 4, 16)
    assert not ok
    assert d[0] == 6 and f[1] == 0.0
    assert d[1] > 6 and d[1] <= 16
    # the last segment must have been split into several Nmin segments
    assert len(d) > 3 and all(x == 4 for x in d[2:])
    assert f[-1] == 1.0
    d2, f2, ok2 = ph_refine_phase((6,), (-1.0, 1.0), np.array([1e-9]), 1e-6, 4, 16)
    assert ok2 and d2 == (6,) and f2 == (-1.0, 1.0)


def test_grid_stats_and_combined_report(tmp_path):
    """Round-4: per-NLP-solve grid_stats on the Solution + the combined
    report artifact (utils/report.py, options.report_file)."""
    from lpopc_tpu.models import brachistochrone
    from lpopc_tpu.utils.report import format_report

    p = brachistochrone.make_problem(degrees=(6, 6))
    rf = tmp_path / "solve-report.txt"
    sol = solve(p, SolveOptions(report_file=str(rf)))
    assert sol.solved
    assert sol.grid_stats, "grid_stats must be populated by the hp loop"
    row = sol.grid_stats[0]
    assert row["grid"] == 1 and row["n"] > 0 and row["m"] > 0
    assert row["iterations"] > 0 and np.isfinite(row["wall_s"])
    assert row["status"] == 1
    # the grids that measured a mesh error carry it
    assert any(r["max_error"] is not None for r in sol.grid_stats)
    txt = rf.read_text()
    assert "NLP solves (hp loop):" in txt
    assert "SOLVED" in txt and "phase 1:" in txt
    assert "mesh refinement history:" in txt
    # report also renders standalone (no problem/options context)
    standalone = format_report(sol)
    assert "objective" in standalone and "status" in standalone


def test_internode_path_violation_measurement():
    """Round-4: inter-node path/state-bound violation estimator — the
    observability the reference never provides (doc/LpopcDoc.tex:1139)."""
    from lpopc_tpu.core.refine import (
        estimate_path_violations, segment_path_violations,
    )
    from lpopc_tpu.models import brysondenham

    # Coarse mesh: the x1 <= l bound arc is under-resolved, so the state
    # overshoots the bound BETWEEN collocation nodes even though every node
    # satisfies it. The estimator must see a positive violation.
    sol_c = solve(
        brysondenham.make_problem(degrees=(4, 4)),
        SolveOptions(mesh_method="none", mesh_bucketing="off"),
    )
    assert sol_c.solved
    p = brysondenham.make_problem(degrees=(4, 4))
    v_c = estimate_path_violations(p, sol_c)[0]
    assert np.max(v_c) > 1e-7, v_c

    # With refinement, the converged solution's excursion is tiny and the
    # Solution carries the measurement.
    sol_f = solve(brysondenham.make_problem(), SolveOptions())
    assert sol_f.solved
    assert np.isfinite(sol_f.path_violation)
    assert sol_f.path_violation < 5e-5, sol_f.path_violation
    assert np.max(v_c) > 3 * sol_f.path_violation

    # Path-FUNCTION rows (npath > 0): speed-limited double integrator; a
    # deliberately violated trajectory must register in the path rows.
    import jax.numpy as jnp

    ph = Phase(
        nx=2, nu=1,
        dynamics=lambda x, u, t, q: jnp.array([x[1], u[0]]),
        lagrange=lambda x, u, t, q: 0.5 * u[0] ** 2,
        path=lambda x, u, t, q: jnp.array([x[1] ** 2]),
        npath=1, path_bounds=(np.array([0.0]), np.array([2.25])),  # |v| <= 1.5
        x0_bounds=(np.zeros(2), np.zeros(2)),
        xf_bounds=(np.array([2.0, 0.0]), np.array([2.0, 0.0])),
        x_bounds=(np.full(2, -10.0), np.full(2, 10.0)),
        u_bounds=(-20.0, 20.0), t0_bounds=(0.0, 0.0), tf_bounds=(2.0, 2.0),
        mesh_degrees=(6, 6), mesh_fractions=(-1.0, 0.0, 1.0),
    )
    prob = Problem(phases=(ph,))
    sol = solve(prob, SolveOptions(mesh_method="none", mesh_bucketing="off"))
    assert sol.solved
    v = segment_path_violations(ph, sol.phases[0])
    assert np.all(np.isfinite(v))
    # fake an out-of-envelope trajectory: inflate the speed trace
    import copy
    ps_bad = copy.copy(sol.phases[0])
    ps_bad.x = np.array(sol.phases[0].x) * np.array([1.0, 2.0])[None, :]
    v_bad = segment_path_violations(ph, ps_bad)
    assert np.max(v_bad) > 0.1, v_bad
