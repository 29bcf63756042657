"""Problem validation: shapes, finiteness, and derivative checks.

Parity with the reference's validation layers (SURVEY.md §2/§4):
``LpSizeChecker`` (shape agreement), ``LpGuessChecker`` validation half, and
``LpANDeriveChecker`` (user-derivative vs finite-difference comparison,
``LpANDeriveChecker.cpp``). With exact AD the *framework's* derivatives need
no checking; what remains useful is checking the **user's functions**: output
shapes, finiteness at sample points inside the bounds, and — when a user
attaches ``jax.custom_jvp``/``custom_vjp`` rules to their dynamics — that
those rules agree with numerical differentiation (``check_grads``).
"""

from __future__ import annotations

import numpy as np

from .problem import INF, Problem


class ProblemCheckError(ValueError):
    pass


def _sample_between(lo, hi, rng):
    lo = np.where(lo <= -INF, -1.0, lo)
    hi = np.where(hi >= INF, 1.0, hi)
    hi = np.where(hi <= lo, lo + 1.0, hi)
    return lo + rng.uniform(0.3, 0.7, size=lo.shape) * (hi - lo)


def check_problem(problem: Problem, derivative_check: bool = True, seed: int = 0) -> None:
    """Validate every user function's output shape/finiteness (and optionally
    its differentiability via ``check_grads``) at sampled interior points.

    Raises :class:`ProblemCheckError` with a per-phase message on failure.
    """
    import jax
    import jax.numpy as jnp
    from jax.test_util import check_grads

    rng = np.random.default_rng(seed)
    ends = []
    for p, ph in enumerate(problem.phases):
        x = jnp.asarray(_sample_between(*map(np.asarray, ph.x_bounds), rng))
        u = jnp.asarray(_sample_between(*map(np.asarray, ph.u_bounds), rng))
        q = jnp.asarray(_sample_between(*map(np.asarray, ph.q_bounds), rng))
        t0 = 0.5 * (max(ph.t0_bounds[0], -1e3) + min(ph.t0_bounds[1], 1e3))
        tf = 0.5 * (max(ph.tf_bounds[0], -1e3) + min(ph.tf_bounds[1], 1e3))
        if tf <= t0:
            tf = t0 + 1.0
        t = jnp.asarray(0.5 * (t0 + tf))

        def _check(name, fn, args, want_shape):
            try:
                out = np.asarray(fn(*args))
            except Exception as e:
                raise ProblemCheckError(f"phase {p}: {name} raised {e!r}") from e
            if out.shape != want_shape:
                raise ProblemCheckError(
                    f"phase {p}: {name} returned shape {out.shape}, expected {want_shape}"
                )
            if not np.all(np.isfinite(out)):
                raise ProblemCheckError(
                    f"phase {p}: {name} returned non-finite values at an interior sample"
                )
            if derivative_check:
                try:
                    check_grads(fn, args, order=1, modes=["fwd"], atol=1e-3, rtol=1e-3)
                except Exception as e:
                    raise ProblemCheckError(
                        f"phase {p}: {name} fails the derivative check "
                        f"(custom rules inconsistent or non-differentiable): {e}"
                    ) from e

        _check("dynamics", ph.dynamics, (x, u, t, q), (ph.nx,))
        if ph.path is not None:
            _check("path", ph.path, (x, u, t, q), (ph.npath,))
        if ph.lagrange is not None:
            _check("lagrange", lambda *a: jnp.reshape(ph.lagrange(*a), ()),
                   (x, u, t, q), ())
        x0 = jnp.asarray(_sample_between(*map(np.asarray, ph.x0_bounds), rng))
        xf = jnp.asarray(_sample_between(*map(np.asarray, ph.xf_bounds), rng))
        if ph.mayer is not None:
            _check("mayer", lambda *a: jnp.reshape(ph.mayer(*a), ()),
                   (x0, jnp.asarray(t0), xf, jnp.asarray(tf), q), ())
        if ph.event is not None:
            _check("event", ph.event,
                   (x0, jnp.asarray(t0), xf, jnp.asarray(tf), q), (ph.nevent,))
        ends.append((xf, q))
    for i, link in enumerate(problem.linkages):
        xf_l, q_l = ends[link.left]
        ph_r = problem.phases[link.right]
        x0_r = jnp.asarray(_sample_between(*map(np.asarray, ph_r.x0_bounds), rng))
        q_r = jnp.asarray(_sample_between(*map(np.asarray, ph_r.q_bounds), rng))
        try:
            out = np.asarray(link.fn(xf_l, q_l, x0_r, q_r))
        except Exception as e:
            raise ProblemCheckError(f"linkage {i}: raised {e!r}") from e
        if out.shape != (link.nlink,):
            raise ProblemCheckError(
                f"linkage {i}: returned shape {out.shape}, expected {(link.nlink,)}"
            )
