"""Runtime-mesh solver + shape-bucketed hp refinement.

Pins: (1) operators materialized from runtime fractions match the
constant-folded ``make_segment_ops`` operators; (2) ``bucket_mesh``'s shape
invariants; (3) the bucketed hp loop converges to the same optimum as the
per-grid-recompile path while compiling only O(1) solvers.
"""

import jax.numpy as jnp
import numpy as np

from lpopc_tpu.core.refine import bucket_mesh
from lpopc_tpu.core.solve import _RT_SOLVER_CACHE, SolveOptions, solve
from lpopc_tpu.ops.lgr import make_segment_ops, materialize_phase_ops


def test_materialized_ops_match_constants():
    degrees = (4, 7, 3)
    fractions = (-1.0, -0.35, 0.4, 1.0)
    op = make_segment_ops(degrees, fractions)
    tau, tau_state, w, D = materialize_phase_ops(
        degrees, jnp.asarray(np.asarray(fractions))
    )
    np.testing.assert_allclose(np.asarray(tau), op.tau, atol=1e-14)
    np.testing.assert_allclose(np.asarray(tau_state), op.tau_state, atol=1e-14)
    np.testing.assert_allclose(np.asarray(w), op.w, atol=1e-14)
    np.testing.assert_allclose(np.asarray(D), op.D, atol=1e-11)


def test_bucket_mesh_invariants():
    d, f = bucket_mesh((4, 7, 5), (-1.0, -0.5, 0.5, 1.0), n_max=16)
    assert len(set(d)) == 1 and d[0] >= 7          # uniform, >= max degree
    assert len(d) == 4 and len(f) == 5             # next pow2 segments
    assert f[0] == -1.0 and f[-1] == 1.0
    assert all(b > a for a, b in zip(f[:-1], f[1:]))
    # original boundaries survive (splits only bisect)
    for x in (-0.5, 0.5):
        assert min(abs(np.asarray(f) - x)) < 1e-15
    # already-bucketed meshes are fixed points
    d2, f2 = bucket_mesh(d, f, n_max=16)
    assert d2 == d and f2 == f


def test_bucketed_hp_solve_matches_and_reuses_compiles():
    from lpopc_tpu.models.hypersensitive import make_problem

    prob = make_problem(tf=40.0, degrees=(6, 6))
    tol = 1e-6
    base = solve(prob, SolveOptions(
        mesh_method="ph", max_grid_num=6, desired_relative_error=tol,
    ))
    _RT_SOLVER_CACHE.clear()
    fast = solve(prob, SolveOptions(
        mesh_method="ph", max_grid_num=6, desired_relative_error=tol,
        mesh_bucketing="on",
    ))
    assert base.solved and fast.solved
    assert fast.max_relative_error <= tol
    # fine-mesh oracle (degrees=(10,)*16, kkt 2.5e-9): the bucketed mesh has
    # MORE points than the ph-refined one, so it lands closer to the oracle —
    # compare both against it, not against each other.
    oracle = 1.3308004319025426
    assert abs(fast.objective - oracle) <= abs(base.objective - oracle) + 1e-9
    np.testing.assert_allclose(fast.objective, oracle, rtol=1e-4)
    # compiled-solver count is bounded by bucket signatures, not grids...
    assert 1 <= len(_RT_SOLVER_CACHE) <= fast.grids
    n_entries = len(_RT_SOLVER_CACHE)
    # ...and a repeat solve of the family reuses every compiled solver:
    # zero new compilations across all its grids (the MPC / sweep / repeated-
    # solve contract that motivates the runtime-mesh design).
    fast2 = solve(prob, SolveOptions(
        mesh_method="ph", max_grid_num=6, desired_relative_error=tol,
        mesh_bucketing="on",
    ))
    assert fast2.solved
    assert len(_RT_SOLVER_CACHE) == n_entries
    # every solved mesh was bucketed: uniform degrees, pow2 segment counts
    for sig in fast.mesh_history:
        for degs, _ in sig:
            assert len(set(degs)) == 1
            assert (len(degs) & (len(degs) - 1)) == 0
