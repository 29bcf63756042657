"""Hybrid 2-D instance×segment sharding (parallel/hybrid.py).

On the 8-virtual-device CPU mesh (2 dp rows × 4 seg columns): a batch of
giant block-KKT instances where the instance axis shards over "dp" and each
instance's segment axis shards over "seg". Verifies equivalence with the
unsharded batch path and that the compiled module actually partitions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpopc_tpu.core.ipm import IPMOptions, SOLVED
from lpopc_tpu.core.solve import SolveOptions
from lpopc_tpu.models import hypersensitive
from lpopc_tpu.parallel.hybrid import hybrid_mesh, make_hybrid_batch_solver


def _problem():
    # 16 segments -> 4 per seg-device on the 2x4 mesh
    return hypersensitive.make_problem(tf=40.0, degrees=(6,) * 16)


def _options():
    return SolveOptions(
        ipm=IPMOptions(tol=1e-8, max_iter=60), mesh_method="none",
        block_kkt="on",
    )


@pytest.fixture(scope="module")
def hybrid():
    mesh = hybrid_mesh(n_dp=2, n_seg=4)
    hb = make_hybrid_batch_solver(_problem(), _options(), mesh=mesh)
    hb.lower(4)
    return hb


def test_mesh_layout(hybrid):
    assert hybrid.mesh.shape == {"dp": 2, "seg": 4}


def test_matches_unsharded_batch(hybrid):
    batch = 4
    z0, zl, zu, cl, cu = hybrid.nominal_inputs(batch)
    # perturb the pinned initial state per instance so instances differ
    pl = hybrid.nlp.layout.phases[0]
    sl = slice(pl.var_offset, pl.var_offset + 1)
    d = 0.05 * np.arange(batch)[:, None] * hybrid.scaled.var_scale[sl][None, :]
    zl[:, sl] += d
    zu[:, sl] += d
    z0[:, sl] += d
    args = tuple(jnp.asarray(a) for a in (z0, zl, zu, cl, cu))
    res_h = hybrid.run(*args)
    st = np.asarray(res_h.status)
    assert np.all(st == SOLVED), st

    # The unsharded reference solve runs in a FRESH process
    # (hybrid_reference_worker.py): XLA:CPU's compiler has segfaulted
    # compiling this large block-KKT program late in a long-lived
    # full-suite process, so the reference arm is isolated from
    # accumulated in-process compiler state.
    import os
    import subprocess
    import sys
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.npz")
        outp = os.path.join(td, "out.npz")
        np.savez(inp, z0=z0, zl=zl, zu=zu, cl=cl, cu=cu,
                 tf=40.0, degrees=np.full(16, 6))
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "hybrid_reference_worker.py"),
             inp, outp],
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        ref = np.load(outp)
        assert np.all(ref["status"] == SOLVED)
        np.testing.assert_allclose(
            np.asarray(res_h.objective), ref["objective"], rtol=1e-9
        )
        np.testing.assert_allclose(np.asarray(res_h.z), ref["z"], atol=1e-8)


def test_actually_partitions_both_axes(hybrid):
    txt = hybrid.compiled.as_text()
    # border Schur assembly reduces over the seg axis
    assert "all-reduce" in txt, "no cross-device collective in compiled module"
    low = hybrid.lowered.as_text()
    assert "sharding" in low


def test_requires_block_path():
    opts = SolveOptions(
        ipm=IPMOptions(tol=1e-8), mesh_method="none", block_kkt="off",
    )
    with pytest.raises(ValueError, match="block-KKT"):
        make_hybrid_batch_solver(
            _problem(), opts, mesh=hybrid_mesh(n_dp=2, n_seg=4)
        )


def test_local_batch_size_single_process(hybrid):
    # single-process: all dp rows are local
    assert hybrid.local_batch_size(4) == 4
