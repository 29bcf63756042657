"""Round-4 feature tests: Mehrotra-probing barrier oracle."""

import numpy as np

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions, solve, solve_on_mesh
from lpopc_tpu.models import brachistochrone, hypersensitive


def _brach_sol(ipm_kw=None, **kw):
    ipm_kw = dict(ipm_kw or {})
    ipm_kw.setdefault("tol", 1e-8)
    ipm_kw.setdefault("max_iter", 100)
    opts = SolveOptions(mesh_method="none", ipm=IPMOptions(**ipm_kw), **kw)
    return solve(brachistochrone.make_problem(degrees=(6, 6)), opts)


def test_probing_mu_same_answer_fewer_iterations():
    """The Mehrotra affine-scaling probe (mu_strategy="probing") must reach
    the same optimum and save iterations over the monotone schedule on BOTH
    bench configs (measured r4: brachistochrone 14 vs 16, hypersensitive
    n=437 8 vs 9)."""
    s_pr = _brach_sol(ipm_kw={"mu_strategy": "probing"})
    s_mono = _brach_sol()
    assert s_pr.status == SOLVED
    assert abs(s_pr.objective - s_mono.objective) < 1e-7
    assert s_pr.iterations < s_mono.iterations

    problem = hypersensitive.make_problem(tf=40.0, degrees=(8,) * 12)
    h_pr = solve_on_mesh(problem, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=200, mu_strategy="probing")))
    h_mono = solve_on_mesh(problem, SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=200)))
    assert h_pr.status == SOLVED and h_mono.status == SOLVED
    assert abs(h_pr.objective - h_mono.objective) < 1e-7
    assert h_pr.iterations <= h_mono.iterations


def test_probing_registry_string():
    """The reference-style option string maps onto the probing oracle."""
    from lpopc_tpu.core.options import from_reference_strings

    opts = from_reference_strings({"mu-strategy": "probing"})
    assert opts.ipm_options().mu_strategy == "probing"


def test_mehrotra_corrector_same_answer_not_slower():
    """probing + second-order corrector (the bench configuration): same
    optimum, no extra iterations (measured r4: 13 vs probing's 14 on the
    brachistochrone bench mesh)."""
    s_me = _brach_sol(ipm_kw={"mu_strategy": "mehrotra"})
    s_pr = _brach_sol(ipm_kw={"mu_strategy": "probing"})
    s_mono = _brach_sol()
    assert s_me.status == SOLVED
    assert abs(s_me.objective - s_mono.objective) < 1e-7
    assert s_me.iterations <= s_pr.iterations
