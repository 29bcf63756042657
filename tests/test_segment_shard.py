"""Segment-axis sharding of one giant instance (parallel/segment.py).

Validates on the 8-virtual-device CPU mesh that
* the segment-sharded solve matches the unsharded block-KKT solve bitwise-
  tightly (same algorithm, different partitioning),
* the compiled module actually partitions (cross-device collectives present,
  per-segment tensors sharded), i.e. the constraints were not silently
  dropped.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import hypersensitive
from lpopc_tpu.parallel.segment import (
    make_segment_solver,
    segment_mesh,
    segment_sharding,
    seg_constrain,
)


def _problem():
    # 16 segments -> 2 per device on the 8-device mesh
    return hypersensitive.make_problem(tf=40.0, degrees=(6,) * 16)


def _options():
    return SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=60), mesh_method="none",
        block_kkt="on",
    )


@pytest.fixture(scope="module")
def sharded_run():
    mesh = segment_mesh(8)
    return make_segment_solver(_problem(), _options(), mesh=mesh)


def test_matches_unsharded(sharded_run):
    res_sh = sharded_run()
    assert int(res_sh.status) == SOLVED

    # unsharded reference: same options, no mesh policy
    from lpopc_tpu.parallel.batch import make_batch_solver

    bs = make_batch_solver(_problem(), _options())
    args = tuple(jnp.asarray(a) for a in bs.nominal_inputs(1))
    res = bs.run(*args)
    assert int(res.status[0]) == SOLVED
    np.testing.assert_allclose(
        float(res_sh.objective), float(res.objective[0]), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.z), np.asarray(res.z[0]), atol=1e-8
    )


def test_actually_partitions(sharded_run):
    txt = sharded_run.compiled.as_text()
    # the border Schur assembly must reduce across devices
    assert "all-reduce" in txt, "no cross-device collective in compiled module"
    # and the sharding constraints must have survived into the lowered module
    low = sharded_run.lowered.as_text()
    assert "sharding" in low  # annotation survived lowering


def test_seg_constrain_noop_outside_policy():
    x = jnp.ones((4, 3))
    assert seg_constrain(x) is x


def test_constraint_traced_inside_policy():
    mesh = segment_mesh(8)
    with segment_sharding(mesh):
        jaxpr = jax.make_jaxpr(lambda x: seg_constrain(x))(jnp.ones((16, 2)))
    assert "sharding_constraint" in str(jaxpr)
