"""Differenced, fold-proof timing of lane-major (VPU) vs batched (dot) linalg.

t(R=103) - t(R=3) within identical programs cancels dispatch overhead.
sin() in every body prevents folding. Run on the TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

rng = np.random.default_rng(0)
B, N, M = 512, 53, 38


def wall_of(fn, x, R):
    f = jax.jit(fn, static_argnums=1)
    out = f(x, R)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(x, R)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def diff_timed(name, body, x, R1=3, R2=103):
    def run(x, R):
        return lax.fori_loop(0, R, lambda i, c: body(c), x)
    w1 = wall_of(run, x, R1)
    w2 = wall_of(run, x, R2)
    per = (w2 - w1) / (R2 - R1)
    print(f"{name:50s} {per*1e6:10.1f} us/iter  (w1={w1*1e3:8.2f}ms w2={w2*1e3:8.2f}ms)",
          flush=True)


dt = jnp.float32
A = jnp.asarray(rng.standard_normal((B, N, N)), dt)
K = A @ jnp.swapaxes(A, -1, -2) + 10.0 * jnp.eye(N, dtype=dt)
KT = jnp.transpose(K, (1, 2, 0)) + 0.0     # (N,N,B) lane-major
v = jnp.asarray(rng.standard_normal((B, N)), dt)
vT = v.T + 0.0                              # (N,B)
JT = jnp.asarray(rng.standard_normal((M, N, B)), dt)
dT = jnp.abs(jnp.asarray(rng.standard_normal((M, B)), dt))

# 1. pure elementwise at the K size — the bandwidth baseline
diff_timed("ew sin (N,N,B)=5.7MB", lambda c: c + jnp.sin(c) * 1e-6, KT)
diff_timed("ew sin (B,N,N)=5.7MB", lambda c: c + jnp.sin(c) * 1e-6, K)
# 2. lane matvec WITHOUT dot: multiply + reduce axis
diff_timed("lane matvec mult+sum (N,N,B)x(N,B)",
           lambda c: c + jnp.sin(jnp.sum(KT * c[None, :, :], axis=1)) * 1e-6, vT)
# 3. batched matvec via dot_general (reference point)
diff_timed("batched matvec dot (B,N,N)x(B,N)",
           lambda c: c + jnp.sin(jnp.einsum("bij,bj->bi", K, c)) * 1e-6, v)
# 4. lane JtDJ as mult+reduce: sum_r J[r,i,b] d[r,b] J[r,j,b]
def jtdj(c):
    Jd = JT * dT[:, None, :]                                  # (M,N,B)
    out = jnp.sum(Jd[:, :, None, :] * JT[:, None, :, :], axis=0)  # (N,N,B)
    return c + jnp.sin(out) * 1e-6
diff_timed("lane JtDJ mult+sum -> (N,N,B)", jtdj, KT)
# 5. batched cholesky reference
diff_timed("batched cholesky (B,N,N)",
           lambda c: c + jnp.sin(jnp.linalg.cholesky(
               K + jnp.abs(c[:, :1, :1]) * 1e-6)) * 1e-6, A)
# 6. lane-major hand-rolled cholesky: sequential over N columns, (B,) lanes
def lane_chol(c):
    # K fixed SPD; factor in (N,N,B) layout via column-by-column updates
    Kw = KT + jnp.abs(c[:1, :1, :]) * 1e-9
    L = jnp.zeros_like(Kw)
    def col(j, state):
        L, Kw = state
        dj = jnp.sqrt(Kw[j, j, :])                            # (B,)
        colv = Kw[:, j, :] / dj[None, :]                      # (N,B)
        mask = (jnp.arange(N) >= j).astype(dt)[:, None]
        colv = colv * mask
        L = L.at[:, j, :].set(colv)
        Kw = Kw - colv[:, None, :] * colv[None, :, :]
        return (L, Kw)
    L, _ = lax.fori_loop(0, N, col, (L, Kw))
    return c + jnp.sin(L[:, 0, :]) * 1e-6 + 0.0 * L[0, 0, 0]
diff_timed("lane cholesky (N cols fori, (B,) lanes)", lane_chol, vT)
# 7. batch-1 matvec for the serialization cross-check
K1, v1 = K[:1], v[:1]
diff_timed("batched matvec dot (1,N,N)x(1,N)",
           lambda c: c + jnp.sin(jnp.einsum("bij,bj->bi", K1, c)) * 1e-6, v1)
