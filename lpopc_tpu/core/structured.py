"""Structure-exploiting derivative assembly for the transcribed NLP.

The transcription is node-separable: defects couple states only through the
constant composite differentiation matrix ``D``; the dynamics/path/Lagrange
terms act node-wise; events/linkages touch endpoints. So instead of one
global ``jax.jacfwd``/``jax.hessian`` over the whole decision vector (whose
graph re-traces the entire transcription per derivative direction), this
module builds

* **per-node derivative blocks** (:func:`make_jac_blocks`,
  :func:`make_hess_blocks`): vmapped Jacobians of the user functions and
  vmapped Hessians of the node Lagrangian
  ``σ (tf-t0)/2 w_k L_k - (tf-t0)/2 λ_kᵀ f_k + λ_kᵀ p_k`` (a function of
  ``[x_k; u_k; t0; tf; q]`` only) plus endpoint/linkage blocks, and
* dense assemblers scattering those blocks around the constant
  ``kron(D, I)`` skeleton (:func:`make_structured_jacobian_mesh`,
  :func:`make_structured_hessian_mesh`).

The blocks are also consumed WITHOUT dense assembly by
:mod:`.kkt_blocks` (matrix-free J/H matvecs + direct per-segment block-KKT
assembly — the long-horizon path that never materializes (m, n)/(n, n)).

This mirrors what the reference hand-codes over ~5 kLoC
(``LpNLPWrapper::GetPhaseJacbi``, ``LpHessian::CalculatePhaseHessian`` —
``/root/reference/Lpopc/src/Core/LpNLPWrapper.cpp:230-862``,
``LpHessian.cpp:1192-2162``) but with exact node-level AD instead of finite
differences. Correctness is pinned by tests comparing against global
``jax.jacfwd``/``jax.hessian``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lgr import SegmentOps
from .problem import Problem
from .transcribe import Layout, unpack_phase


def _node_indices(pl, nq_cols=True) -> np.ndarray:
    """(N, nb) global variable indices of node k's inputs [x_k, u_k, t0, tf, q]."""
    N, nx, nu, nq = pl.N, pl.nx, pl.nu, pl.nq
    idx = np.empty((N, nx + nu + 2 + nq), dtype=np.int32)
    for k in range(N):
        cols = []
        cols.extend(pl.var_offset + k * nx + np.arange(nx))
        cols.extend(pl.var_offset + pl.npts * nx + k * nu + np.arange(nu))
        cols.append(pl.t0_index)
        cols.append(pl.tf_index)
        cols.extend(pl.q_slice.start + np.arange(nq))
        idx[k] = cols
    return idx


def _endpoint_indices(pl) -> np.ndarray:
    """Global indices of [x0, t0, xf, tf, q]."""
    nx, nq = pl.nx, pl.nq
    return np.concatenate([
        pl.var_offset + np.arange(nx),
        [pl.t0_index],
        pl.var_offset + pl.N * nx + np.arange(nx),
        [pl.tf_index],
        pl.q_slice.start + np.arange(nq),
    ]).astype(np.int32)


def _link_indices(layout, link) -> np.ndarray:
    """Global indices of a linkage's inputs [xf_left, q_left, x0_right, q_right]."""
    pll, plr = layout.phases[link.left], layout.phases[link.right]
    return np.concatenate([
        pll.var_offset + pll.N * pll.nx + np.arange(pll.nx),
        pll.q_slice.start + np.arange(pll.nq),
        plr.var_offset + np.arange(plr.nx),
        plr.q_slice.start + np.arange(plr.nq),
    ]).astype(np.int32)


class PhaseJacBlocks(NamedTuple):
    dblocks: jnp.ndarray   # (N, nx, nbn)   -(tf-t0)/2 ∂f/∂[x,u,t0,tf,q]
    pblocks: jnp.ndarray   # (N, npath, nbn)
    eblock: jnp.ndarray    # (nevent, ne)   ∂event/∂[x0,t0,xf,tf,q]


class PhaseHessBlocks(NamedTuple):
    hblocks: jnp.ndarray   # (N, nbn, nbn) node-Lagrangian Hessians
    hend: jnp.ndarray      # (ne, ne) endpoint (Mayer + event) Hessian


def _phase_node_inputs(pl, X, U, t0, tf, q):
    return jnp.concatenate(
        [
            X[:-1],
            U,
            jnp.broadcast_to(t0, (pl.N,))[:, None],
            jnp.broadcast_to(tf, (pl.N,))[:, None],
            jnp.broadcast_to(q, (pl.N, pl.nq)),
        ],
        axis=1,
    )


def make_jac_blocks(problem: Problem, layout: Layout) -> Callable:
    """Return ``jac_blocks(z, mesh) -> (phase_blocks, link_blocks)``.

    ``phase_blocks[p]`` is a :class:`PhaseJacBlocks`; ``link_blocks[l]`` is
    the (nlink, nl) Jacobian of linkage ``l``. The (constant) ``kron(D, I)``
    defect skeleton and the linear rows are NOT in the blocks — consumers add
    them from the mesh/layout.
    """

    def jac_blocks(z, mesh):
        phase_blocks = []
        ends, starts = [], []
        for ph, pl, (tau, _, _, _) in zip(problem.phases, layout.phases, mesh):
            X, U, t0, tf, q = unpack_phase(pl, z)
            tau = jnp.asarray(tau, z.dtype)

            def node_dyn(xi, k):
                nx, nu = pl.nx, pl.nu
                x = xi[:nx]
                u = xi[nx : nx + nu]
                t0_, tf_ = xi[nx + nu], xi[nx + nu + 1]
                q_ = xi[nx + nu + 2 :]
                t = (tau[k] + 1.0) * (tf_ - t0_) / 2.0 + t0_
                f = ph.dynamics(x, u, t, q_)
                return -(tf_ - t0_) / 2.0 * jnp.reshape(f, (nx,))

            xi_nodes = _phase_node_inputs(pl, X, U, t0, tf, q)
            dblocks = jax.vmap(jax.jacfwd(node_dyn), in_axes=(0, 0))(
                xi_nodes, jnp.arange(pl.N)
            )  # (N, nx, nbn)

            nbn = xi_nodes.shape[1]
            if ph.npath > 0:
                def node_path(xi, k):
                    nx, nu = pl.nx, pl.nu
                    x = xi[:nx]
                    u = xi[nx : nx + nu]
                    t0_, tf_ = xi[nx + nu], xi[nx + nu + 1]
                    q_ = xi[nx + nu + 2 :]
                    t = (tau[k] + 1.0) * (tf_ - t0_) / 2.0 + t0_
                    return jnp.reshape(ph.path(x, u, t, q_), (pl.npath,))

                pblocks = jax.vmap(jax.jacfwd(node_path), in_axes=(0, 0))(
                    xi_nodes, jnp.arange(pl.N)
                )
            else:
                pblocks = jnp.zeros((pl.N, 0, nbn), z.dtype)

            ne = 2 * pl.nx + 2 + pl.nq
            if ph.nevent > 0:
                def ev(xe):
                    nx = pl.nx
                    return jnp.reshape(
                        ph.event(xe[:nx], xe[nx], xe[nx + 1 : 2 * nx + 1],
                                 xe[2 * nx + 1], xe[2 * nx + 2 :]),
                        (pl.nevent,),
                    )

                xe = jnp.concatenate(
                    [X[0], jnp.reshape(t0, (1,)), X[-1], jnp.reshape(tf, (1,)), q]
                )
                eblock = jax.jacfwd(ev)(xe)  # (nevent, ne)
            else:
                eblock = jnp.zeros((0, ne), z.dtype)
            phase_blocks.append(
                PhaseJacBlocks(dblocks=dblocks, pblocks=pblocks, eblock=eblock)
            )
            starts.append((X[0], t0, q))
            ends.append((X[-1], tf, q))

        link_blocks = []
        for link in problem.linkages:
            if link.nlink == 0:
                link_blocks.append(jnp.zeros((0, 0), z.dtype))
                continue
            pll, plr = layout.phases[link.left], layout.phases[link.right]
            xfl, tfl, ql = ends[link.left]
            x0r, t0r, qr = starts[link.right]
            nxl, nql, nxr = pll.nx, pll.nq, plr.nx

            def lk(v):
                return jnp.reshape(
                    link.fn(v[:nxl], v[nxl : nxl + nql],
                            v[nxl + nql : nxl + nql + nxr], v[nxl + nql + nxr :]),
                    (link.nlink,),
                )

            v = jnp.concatenate([xfl, ql, x0r, qr])
            link_blocks.append(jax.jacfwd(lk)(v))
        return phase_blocks, link_blocks

    return jac_blocks


def make_hess_blocks(problem: Problem, layout: Layout) -> Callable:
    """Return ``hess_blocks(z, lam, mesh, sigma=1.0) ->
    (phase_hblocks, link_hblocks)`` — the per-node / endpoint / linkage
    pieces of the Lagrangian Hessian ``∇²[σ f(z) + λᵀ c(z)]``."""

    def hess_blocks(z, lam, mesh, sigma=1.0):
        phase_h = []
        ends, starts = [], []
        for ph, pl, (tau, _, w, _) in zip(problem.phases, layout.phases, mesh):
            X, U, t0, tf, q = unpack_phase(pl, z)
            tau = jnp.asarray(tau, z.dtype)
            w = jnp.asarray(w, z.dtype)
            lam_def = lam[pl.con_offset : pl.con_offset + pl.N * pl.nx].reshape(
                pl.N, pl.nx
            )
            if ph.npath > 0:
                poff = pl.con_offset + pl.N * pl.nx
                lam_path = lam[poff : poff + pl.N * ph.npath].reshape(pl.N, ph.npath)
            else:
                lam_path = jnp.zeros((pl.N, 0), z.dtype)

            def node_lag(xi, k, ldef, lpath):
                nx, nu = pl.nx, pl.nu
                x = xi[:nx]
                u = xi[nx : nx + nu]
                t0_, tf_ = xi[nx + nu], xi[nx + nu + 1]
                q_ = xi[nx + nu + 2 :]
                half_ = (tf_ - t0_) / 2.0
                t = (tau[k] + 1.0) * half_ + t0_
                val = -half_ * jnp.dot(ldef, jnp.reshape(ph.dynamics(x, u, t, q_), (nx,)))
                if ph.lagrange is not None:
                    val = val + sigma * half_ * w[k] * jnp.reshape(
                        ph.lagrange(x, u, t, q_), ())
                if ph.npath > 0:
                    val = val + jnp.dot(
                        lpath, jnp.reshape(ph.path(x, u, t, q_), (ph.npath,))
                    )
                return val

            xi_nodes = _phase_node_inputs(pl, X, U, t0, tf, q)
            hblocks = jax.vmap(jax.hessian(node_lag), in_axes=(0, 0, 0, 0))(
                xi_nodes, jnp.arange(pl.N), lam_def, lam_path
            )  # (N, nbn, nbn)

            ne = 2 * pl.nx + 2 + pl.nq
            if ph.mayer is not None or ph.nevent > 0:
                eoff = pl.con_offset + pl.N * pl.nx + pl.N * pl.npath
                lam_ev = lam[eoff : eoff + pl.nevent]

                def end_lag(xe):
                    nx = pl.nx
                    x0_, t0_ = xe[:nx], xe[nx]
                    xf_, tf_ = xe[nx + 1 : 2 * nx + 1], xe[2 * nx + 1]
                    q_ = xe[2 * nx + 2 :]
                    val = jnp.zeros((), z.dtype)
                    if ph.mayer is not None:
                        val = val + sigma * jnp.reshape(
                            ph.mayer(x0_, t0_, xf_, tf_, q_), ())
                    if ph.nevent > 0:
                        val = val + jnp.dot(
                            lam_ev,
                            jnp.reshape(ph.event(x0_, t0_, xf_, tf_, q_), (pl.nevent,)),
                        )
                    return val

                xe = jnp.concatenate(
                    [X[0], jnp.reshape(t0, (1,)), X[-1], jnp.reshape(tf, (1,)), q]
                )
                hend = jax.hessian(end_lag)(xe)
            else:
                hend = jnp.zeros((ne, ne), z.dtype)
            phase_h.append(PhaseHessBlocks(hblocks=hblocks, hend=hend))
            starts.append((X[0], t0, q))
            ends.append((X[-1], tf, q))

        link_h = []
        for link, loff in zip(problem.linkages, layout.link_offsets):
            if link.nlink == 0:
                link_h.append(jnp.zeros((0, 0), z.dtype))
                continue
            pll, plr = layout.phases[link.left], layout.phases[link.right]
            xfl, tfl, ql = ends[link.left]
            x0r, t0r, qr = starts[link.right]
            nxl, nql, nxr = pll.nx, pll.nq, plr.nx
            lam_l = lam[loff : loff + link.nlink]

            def link_lag(v):
                return jnp.dot(
                    lam_l,
                    jnp.reshape(
                        link.fn(v[:nxl], v[nxl : nxl + nql],
                                v[nxl + nql : nxl + nql + nxr],
                                v[nxl + nql + nxr :]),
                        (link.nlink,),
                    ),
                )

            v = jnp.concatenate([xfl, ql, x0r, qr])
            link_h.append(jax.hessian(link_lag)(v))
        return phase_h, link_h

    return hess_blocks


def make_structured_jacobian_mesh(problem: Problem, layout: Layout) -> Callable:
    """Return ``jac(z, mesh) -> (m, n)`` assembled from per-node blocks;
    ``mesh`` is the per-phase ``(tau, tau_state, w, D)`` tuple (constants or
    traced runtime-mesh arrays, see ``transcribe.make_objective_mesh``)."""
    n, m = layout.nvar, layout.ncon

    # constant skeleton: the linear (duration / time-link) rows. The
    # kron(D, I_nx) defect skeleton is mesh-dependent and scattered at trace
    # time below.
    skeleton = np.zeros((m, n))
    row = layout.linear_offset
    for pl in layout.phases:
        skeleton[row, pl.tf_index] = 1.0
        skeleton[row, pl.t0_index] = -1.0
        row += 1
    for link in problem.linkages:
        skeleton[row, layout.phases[link.right].t0_index] = 1.0
        skeleton[row, layout.phases[link.left].tf_index] = -1.0
        row += 1
    skeleton_j = jnp.asarray(skeleton)

    node_idx = [jnp.asarray(_node_indices(pl)) for pl in layout.phases]
    end_idx = [jnp.asarray(_endpoint_indices(pl)) for pl in layout.phases]
    link_idx = [jnp.asarray(_link_indices(layout, l)) for l in problem.linkages]
    jac_blocks = make_jac_blocks(problem, layout)

    def jac(z, mesh):
        J = skeleton_j.astype(z.dtype)
        phase_blocks, link_blocks = jac_blocks(z, mesh)
        for pl, (_, _, _, D), pb, nidx, eidx in zip(
            layout.phases, mesh, phase_blocks, node_idx, end_idx
        ):
            if pl.nx:
                J = J.at[
                    pl.con_offset : pl.con_offset + pl.N * pl.nx,
                    pl.var_offset : pl.var_offset + pl.npts * pl.nx,
                ].add(jnp.kron(jnp.asarray(D, z.dtype), jnp.eye(pl.nx, dtype=z.dtype)))
            rows = (
                pl.con_offset
                + jnp.arange(pl.N)[:, None, None] * pl.nx
                + jnp.arange(pl.nx)[None, :, None]
            )
            cols = jnp.broadcast_to(nidx[:, None, :], pb.dblocks.shape)
            J = J.at[rows, cols].add(pb.dblocks)

            if pl.npath > 0:
                poff = pl.con_offset + pl.N * pl.nx
                prow = (
                    poff
                    + jnp.arange(pl.N)[:, None, None] * pl.npath
                    + jnp.arange(pl.npath)[None, :, None]
                )
                pcol = jnp.broadcast_to(nidx[:, None, :], pb.pblocks.shape)
                J = J.at[prow, pcol].add(pb.pblocks)

            if pl.nevent > 0:
                eoff = pl.con_offset + pl.N * pl.nx + pl.N * pl.npath
                erow = eoff + jnp.arange(pl.nevent)[:, None]
                ecol = jnp.broadcast_to(eidx[None, :], pb.eblock.shape)
                J = J.at[erow, ecol].add(pb.eblock)

        for link, loff, lblock, lidx in zip(
            problem.linkages, layout.link_offsets, link_blocks, link_idx
        ):
            if link.nlink == 0:
                continue
            lrow = loff + jnp.arange(link.nlink)[:, None]
            lcol = jnp.broadcast_to(lidx[None, :], lblock.shape)
            J = J.at[lrow, lcol].add(lblock)
        return J

    return jac


def make_structured_jacobian(
    problem: Problem, layout: Layout, ops: Sequence[SegmentOps]
) -> Callable:
    """``jac(z) -> (m, n)`` on a fixed mesh (operators baked as constants)."""
    from .transcribe import const_mesh

    jac_m = make_structured_jacobian_mesh(problem, layout)
    mesh = const_mesh(ops)
    return lambda z: jac_m(z, mesh)


def make_structured_hessian_mesh(problem: Problem, layout: Layout) -> Callable:
    """Return ``hess(z, lam, mesh, sigma=1.0) -> (n, n)``: the Lagrangian
    Hessian ``∇²[σ f(z) + λᵀ c(z)]`` assembled from per-node blocks."""
    n = layout.nvar
    node_idx = [jnp.asarray(_node_indices(pl)) for pl in layout.phases]
    end_idx = [jnp.asarray(_endpoint_indices(pl)) for pl in layout.phases]
    link_idx = [jnp.asarray(_link_indices(layout, l)) for l in problem.linkages]
    hess_blocks = make_hess_blocks(problem, layout)

    def hess(z, lam, mesh, sigma=1.0):
        H = jnp.zeros((n, n), dtype=z.dtype)
        phase_h, link_h = hess_blocks(z, lam, mesh, sigma)
        for pl, phb, nidx, eidx in zip(layout.phases, phase_h, node_idx, end_idx):
            rows = jnp.broadcast_to(nidx[:, :, None], phb.hblocks.shape)
            cols = jnp.broadcast_to(nidx[:, None, :], phb.hblocks.shape)
            H = H.at[rows, cols].add(phb.hblocks)
            H = H.at[eidx[:, None], eidx[None, :]].add(phb.hend)
        for link, hl, lidx in zip(problem.linkages, link_h, link_idx):
            if link.nlink == 0:
                continue
            H = H.at[lidx[:, None], lidx[None, :]].add(hl)
        return H

    return hess


def make_structured_hessian(
    problem: Problem, layout: Layout, ops: Sequence[SegmentOps]
) -> Callable:
    """``hess(z, lam, sigma=1.0) -> (n, n)`` on a fixed mesh."""
    from .transcribe import const_mesh

    hess_m = make_structured_hessian_mesh(problem, layout)
    mesh = const_mesh(ops)
    return lambda z, lam, sigma=1.0: hess_m(z, lam, mesh, sigma)
