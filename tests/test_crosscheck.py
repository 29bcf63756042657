"""Independent cross-validation: our IPM vs scipy SLSQP on the same NLP.

The reference validates against IPOPT implicitly (it IS the solver); here a
third-party NLP solver (scipy's SLSQP) is run on the identical transcribed
problem and must agree with the interior-point result — catching any bug that
a self-consistent solver + transcription pair could hide.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import NonlinearConstraint, minimize

from lpopc_tpu.core.solve import SolveOptions, solve
from lpopc_tpu.core.transcribe import transcribe
from lpopc_tpu.models import brachistochrone


def test_ipm_matches_slsqp_on_brachistochrone():
    problem = brachistochrone.make_problem(degrees=(5, 5))
    nlp = transcribe(problem)
    sol = solve(problem, SolveOptions(mesh_method="none"))
    assert sol.solved

    con = jax.jit(nlp.constraints)
    jac = jax.jit(jax.jacfwd(nlp.constraints))
    obj = jax.jit(nlp.objective)
    grad = jax.jit(jax.grad(nlp.objective))
    res = minimize(
        lambda z: float(obj(jnp.asarray(z))),
        nlp.z0,
        jac=lambda z: np.asarray(grad(jnp.asarray(z))),
        bounds=list(zip(np.where(nlp.zl < -1e19, -np.inf, nlp.zl),
                        np.where(nlp.zu > 1e19, np.inf, nlp.zu))),
        constraints=[NonlinearConstraint(
            lambda z: np.asarray(con(jnp.asarray(z))),
            np.where(nlp.cl < -1e19, -np.inf, nlp.cl),
            np.where(nlp.cu > 1e19, np.inf, nlp.cu),
            jac=lambda z: np.asarray(jac(jnp.asarray(z))),
        )],
        method="SLSQP",
        options={"maxiter": 400, "ftol": 1e-12},
    )
    assert res.success, res.message
    # both solvers find the same minimum-time optimum
    np.testing.assert_allclose(res.fun, sol.objective, atol=1e-6)
    np.testing.assert_allclose(res.fun, brachistochrone.analytic_tf(), atol=1e-5)
