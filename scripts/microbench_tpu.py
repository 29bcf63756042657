"""Trustworthy cost model: fold-proof bodies, best-of-5."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 30
rng = np.random.default_rng(0)


def timed(name, fn, *args, per=R):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best/per*1e6:10.1f} us/iter")
    return best / per


def loop(body):
    return lambda x: lax.fori_loop(0, R, lambda i, c: body(c), x)


print("== bandwidth curve (c + sin(c)*1e-6) ==")
for sz in (512 * 53, 512 * 53 * 53, 8_000_000, 64_000_000):
    x = jnp.asarray(rng.standard_normal(sz), jnp.float32)
    w = timed(f"ew {sz/1e6:.2f}M", loop(lambda c: c + jnp.sin(c) * 1e-6), x)
    print(f"    -> {2*sz*4/w/1e9:7.1f} GB/s")

print("== batched small linalg (B=512, n=53) f32 ==")
B, N = 512, 53
A = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)
K = A @ jnp.swapaxes(A, -1, -2) + 10.0 * jnp.eye(N, dtype=jnp.float32)
v = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
timed("batched matvec", loop(lambda c: c + jnp.sin(jnp.einsum("bij,bj->bi", K, c)) * 1e-6), v)
timed("batched matmul", loop(lambda c: c + jnp.sin(c @ K) * 1e-4), A)
timed("batched cholesky", loop(
    lambda c: c + jnp.sin(jnp.linalg.cholesky(K + jnp.abs(c[:, :1, :1]) * 1e-6)) * 1e-6), A)
eyeB = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (B, N, N))
L0 = jnp.linalg.cholesky(K)
timed("batched tri Linv", loop(
    lambda c: c + jnp.sin(jax.scipy.linalg.solve_triangular(
        L0 + jnp.abs(c[:, :1, :1]) * 1e-9, eyeB, lower=True)) * 1e-6), A)
print("== same in f64 ==")
K64 = K.astype(jnp.float64)
A64 = A.astype(jnp.float64)
v64 = v.astype(jnp.float64)
L64 = jnp.linalg.cholesky(K64)
eyeB64 = eyeB.astype(jnp.float64)
timed("f64 batched matvec", loop(lambda c: c + jnp.sin(jnp.einsum("bij,bj->bi", K64, c)) * 1e-6), v64)
timed("f64 batched matmul", loop(lambda c: c + jnp.sin(c @ K64) * 1e-4), A64)
timed("f64 batched cholesky", loop(
    lambda c: c + jnp.sin(jnp.linalg.cholesky(K64 + jnp.abs(c[:, :1, :1]) * 1e-6)) * 1e-6), A64)
timed("f64 batched tri Linv", loop(
    lambda c: c + jnp.sin(jax.scipy.linalg.solve_triangular(
        L64 + jnp.abs(c[:, :1, :1]) * 1e-9, eyeB64, lower=True)) * 1e-6), A64)
print("== lane layout (N,N,B) f32 ==")
KT = jnp.transpose(K, (1, 2, 0))
vT = v.T
timed("lane matvec ijb,jb->ib", loop(
    lambda c: c + jnp.sin(jnp.einsum("ijb,jb->ib", KT, c)) * 1e-6), vT)
M_, Nn = 38, N
J = jnp.asarray(rng.standard_normal((M_, N, B)), jnp.float32)
dd = jnp.abs(jnp.asarray(rng.standard_normal((M_, B)), jnp.float32))
timed("lane JtDJ rib,rb,rjb->ijb", loop(
    lambda c: c + jnp.sin(jnp.einsum("rib,rb,rjb->ijb", J, dd, J)) * 1e-6), KT)
timed("batched JtDJ bri,br,brj->bij", loop(
    lambda c: c + jnp.sin(jnp.einsum("bri,br,brj->bij",
                                     jnp.transpose(J, (2, 0, 1)),
                                     dd.T, jnp.transpose(J, (2, 0, 1)))) * 1e-6), K)
