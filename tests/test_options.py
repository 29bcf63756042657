"""Option registry: reference-name mapping, validation, checkpointed solves."""

import numpy as np
import pytest

from lpopc_tpu.core.options import (
    OptionError, describe, from_reference_strings, validate,
)
from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.models import moonlander


def test_reference_option_names_map():
    o = from_reference_strings({
        "Ipopt-tol": 1e-6, "mesh-refine-methods": "hp-Liu",
        "max-grid-num": 20, "Nmax": 12, "Nmin": 3,
        "desired-relative-error": 1e-5, "auto-scale": True,
    })
    assert o.tol == 1e-6
    assert o.mesh_method == "hp-liu"
    assert o.max_grid_num == 20
    assert o.n_max == 12 and o.n_min == 3
    assert o.desired_relative_error == 1e-5


def test_unknown_and_invalid_options_raise():
    with pytest.raises(OptionError):
        from_reference_strings({"bogus": 1})
    with pytest.raises(OptionError):
        validate(SolveOptions(mesh_method="nope"))
    with pytest.raises(OptionError):
        validate(SolveOptions(n_min=20, n_max=4))
    with pytest.raises(OptionError):
        validate(SolveOptions(tol=-1.0))


def test_describe_lists_all_reference_names():
    text = describe()
    for name in ("Ipopt-tol", "mesh-refine-methods", "max-grid-num",
                 "desired-relative-error", "Nmax", "Nmin", "R", "auto-scale"):
        assert name in text


def test_solve_writes_checkpoints(tmp_path):
    sol = solve(
        moonlander.make_problem(degrees=(4, 4)),
        SolveOptions(mesh_method="ph", max_grid_num=2,
                     desired_relative_error=1e-9,  # force a refinement step
                     checkpoint_dir=str(tmp_path)),
    )
    import glob

    ckpts = sorted(glob.glob(str(tmp_path / "grid_*.npz")))
    assert len(ckpts) == sol.grids
    # resume produces a warm problem on the last mesh
    from lpopc_tpu.utils.checkpoint import resume_problem

    prob2, grid = resume_problem(moonlander.make_problem(degrees=(4, 4)), str(tmp_path))
    assert grid == sol.grids
    sol2 = solve(prob2, SolveOptions(mesh_method="none"))
    assert sol2.solved
