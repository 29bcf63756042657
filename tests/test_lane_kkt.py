"""Lane-parallel KKT path: custom_vmap dispatch to Pallas kernels in the IPM."""

import jax
import jax.numpy as jnp
import numpy as np

from lpopc_tpu.core.ipm import IPMOptions, SOLVED, build_solver
from lpopc_tpu.core.problem import INF


def test_lane_kkt_matches_plain_on_batched_hs071():
    obj = lambda z: z[0] * z[3] * (z[0] + z[1] + z[2]) + z[2]
    con = lambda z: jnp.array([z[0] * z[1] * z[2] * z[3], jnp.sum(z**2)])
    B = 3

    def run(lane):
        solver = build_solver(
            obj, con, 4, 2, IPMOptions(tol=1e-8, max_iter=60, lane_kkt=lane)
        )
        args = (
            jnp.tile(jnp.array([1.0, 5.0, 5.0, 1.0]), (B, 1)),
            jnp.ones((B, 4)), jnp.full((B, 4), 5.0),
            jnp.tile(jnp.array([25.0, 40.0]), (B, 1)),
            jnp.tile(jnp.array([INF, 40.0]), (B, 1)),
        )
        return jax.jit(jax.vmap(solver))(*args)

    r0 = run(False)
    r1 = run(True)
    assert np.all(np.asarray(r1.status) == SOLVED)
    np.testing.assert_allclose(np.asarray(r1.z), np.asarray(r0.z), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r1.objective), 17.0140173, atol=1e-5
    )
