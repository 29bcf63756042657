"""Structured derivative assembly vs global AD (the exactness oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpopc_tpu.core.structured import make_structured_hessian, make_structured_jacobian
from lpopc_tpu.core.transcribe import transcribe
from lpopc_tpu.models import brachistochrone, launch, lowthrust, moonlander


def _compare(problem, seed=0, atol=1e-9):
    nlp = transcribe(problem)
    rng = np.random.default_rng(seed)
    z = jnp.asarray(nlp.z0 + 0.05 * rng.standard_normal(nlp.n) * (1 + np.abs(nlp.z0)))
    lam = jnp.asarray(rng.standard_normal(nlp.m))
    J_ref = np.asarray(jax.jacfwd(nlp.constraints)(z))
    J_st = np.asarray(make_structured_jacobian(problem, nlp.layout, nlp.ops)(z))
    np.testing.assert_allclose(J_st, J_ref, atol=atol, rtol=1e-8)
    H_ref = np.asarray(
        jax.hessian(lambda zz: nlp.objective(zz) + lam @ nlp.constraints(zz))(z)
    )
    H_st = np.asarray(
        make_structured_hessian(problem, nlp.layout, nlp.ops)(z, lam, 1.0)
    )
    np.testing.assert_allclose(H_st, H_ref, atol=atol, rtol=1e-8)


def test_structured_brachistochrone():
    _compare(brachistochrone.make_problem(degrees=(4, 5)))


def test_structured_moonlander():
    _compare(moonlander.make_problem(degrees=(3, 4)))


def test_structured_lowthrust_path_event():
    _compare(lowthrust.make_problem(degrees=(4, 4)))


def test_structured_launch_multiphase_linkages():
    _compare(launch.make_problem(degrees_per_phase=(3, 3, 3, 3),
                                 segs_per_phase=(1, 1, 1, 2)), atol=1e-7)
