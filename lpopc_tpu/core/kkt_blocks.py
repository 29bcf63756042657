"""Matrix-free structured KKT: block matvecs + direct block assembly.

The round-1 structured path assembled per-node derivative blocks into DENSE
(m, n) / (n, n) matrices, and the block factorizer then gathered its segment
blocks back out of the dense condensed ``K`` — O(n²) memory and assembly on
every iteration. This module removes the dense intermediates entirely (the
capability match for the reference's sparse-triplet assembly + MUMPS, which
never forms dense matrices — ``LpNLPWrapper.cpp:230-862``,
``LpNLPSolver.cpp``):

* ``jv``/``jtv``/``hv`` — Jacobian / transposed-Jacobian / Lagrangian-Hessian
  matvecs computed directly from the per-node blocks of
  :mod:`.structured` (einsum + static-index scatter; O(N) memory),
* ``assemble`` — the condensed KKT ``K = H + Σ + δI + Jᵀ D J`` built
  **per segment** into the ``(A, B, C)`` block form of
  :mod:`.block_kkt` (interior blocks, border coupling, border block):
  each segment's local Jacobian (defect + path rows over its support)
  and node Hessians land in a local ``(bl, bl)`` stiffness via static index
  maps, then split into interior/border parts — O(S·b²) memory total.

Everything is shape-static (per-phase degrees are padded to the phase max
with masks), jit/vmap-compatible, and works for both baked-constant meshes
and the runtime-mesh (traced D / fractions) solver used by shape-bucketed
hp refinement.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_kkt import BlockKKTSpec, factor_from_blocks, make_block_factorizer
from ..parallel.segment import seg_constrain
from .problem import Problem
from .structured import (
    _endpoint_indices,
    _link_indices,
    _node_indices,
    make_hess_blocks,
    make_jac_blocks,
)
from .transcribe import Layout


class _PhaseMaps(NamedTuple):
    """Static per-phase index maps (numpy -> device constants)."""

    node_of: np.ndarray      # (S, degmax) node index (0-padded)
    node_mask: np.ndarray    # (S, degmax) bool
    xpt_of: np.ndarray       # (S, degmax+1) X support-point index (0-padded)
    xpt_mask: np.ndarray     # (S, degmax+1) bool
    nloc: np.ndarray         # (S, degmax, nbn) local col of node inputs
    xpt_loc: np.ndarray      # (S, degmax+1) local col base of X support point
    drow_glob: np.ndarray    # (S, degmax, nx) global constraint row of defects
    prow_glob: np.ndarray    # (S, degmax, npath) global row of path rows
    border_pos: np.ndarray   # (S, lbmax) border position of local border slots
    border_mask: np.ndarray  # (S, lbmax) bool
    epos: np.ndarray         # (ne,) border positions of [x0, t0, xf, tf, q]
    erow_glob: np.ndarray    # (nevent,) global rows of event constraints
    seg_off: int             # first global segment index of this phase
    nseg: int


class StructuredKKT(NamedTuple):
    """Mesh/scale-parametric closures; :func:`bind` produces the IPM-facing
    object with mesh + scaling baked (or routed through aux)."""

    jac_blocks: Callable   # (z_raw, mesh, sc, vinv) -> jblocks dict
    hess_blocks: Callable  # (z_raw, lam_scaled, mesh, sf, sc, vinv) -> hblocks
    jv: Callable           # (jblocks, v_scaledspace) -> (m,) scaled rows
    jtv: Callable          # (jblocks, u) -> (n,)
    hv: Callable           # (hblocks, v) -> (n,)
    assemble: Callable     # (jblocks, hblocks, d, wdiag) -> (A, B, C)
    factorize: Callable    # (jblocks, hblocks, d, wdiag) -> BlockFactor
    fsolve: Callable       # (F, r) -> K^{-1} r
    factor_ok: Callable    # F -> bool


class BoundKKT(NamedTuple):
    """What the IPM consumes: everything bound except the evaluation point."""

    jac_blocks: Callable   # z_scaled -> jblocks
    hess_blocks: Callable  # (z_scaled, lam_scaledspace) -> hblocks
    jv: Callable
    jtv: Callable
    hv: Callable
    factorize: Callable    # (jblocks, hblocks, d, wdiag) -> F
    fsolve: Callable
    factor_ok: Callable


def _build_phase_maps(problem: Problem, layout: Layout, spec: BlockKKTSpec):
    """Numpy index maps per phase, consistent with make_block_spec's ordering
    (interior: x inner points raveled then controls; border per phase:
    separator x's, then [t0, tf], then q)."""
    bmax = spec.block_size
    maps = []
    seg_off = 0
    border_off = 0
    lbmax = max(2 * pl.nx + 2 + pl.nq for pl in layout.phases)
    degmax_all = 0
    for ph, pl in zip(problem.phases, layout.phases):
        degrees = list(ph.mesh_degrees)
        degmax_all = max(degmax_all, max(degrees))
    for ph, pl in zip(problem.phases, layout.phases):
        degrees = list(ph.mesh_degrees)
        S = len(degrees)
        nx, nu, nq, npath = pl.nx, pl.nu, pl.nq, pl.npath
        degmax = degmax_all
        nbn = nx + nu + 2 + nq
        seg_starts = np.concatenate([[0], np.cumsum(degrees)])[:-1].astype(int)
        node_of = np.zeros((S, degmax), np.int32)
        node_mask = np.zeros((S, degmax), bool)
        xpt_of = np.zeros((S, degmax + 1), np.int32)
        xpt_mask = np.zeros((S, degmax + 1), bool)
        nloc = np.zeros((S, degmax, nbn), np.int32)
        xpt_loc = np.zeros((S, degmax + 1), np.int32)
        drow_glob = np.zeros((S, degmax, nx), np.int32)
        prow_glob = np.zeros((S, degmax, max(npath, 0)), np.int32)
        border_pos = np.zeros((S, lbmax), np.int32)
        border_mask = np.zeros((S, lbmax), bool)
        # border layout of this phase within spec.border_idx
        # (x at S+1 separator points, then t0, tf, then q)
        xsep_base = border_off
        t0_pos = border_off + (S + 1) * nx
        tf_pos = t0_pos + 1
        q_base = tf_pos + 1
        for s, deg in enumerate(degrees):
            start = int(seg_starts[s])
            node_of[s, :deg] = start + np.arange(deg)
            node_mask[s, :deg] = True
            xpt_of[s, : deg + 1] = start + np.arange(deg + 1)
            xpt_mask[s, : deg + 1] = True
            # local border slots: [x_start (nx), x_end (nx), t0, tf, q]
            lb_x_start = bmax
            lb_x_end = bmax + nx
            lb_t0 = bmax + 2 * nx
            lb_tf = lb_t0 + 1
            lb_q = lb_tf + 1
            # local col of X support point k
            for k in range(deg + 1):
                if k == 0:
                    xpt_loc[s, k] = lb_x_start
                elif k == deg:
                    xpt_loc[s, k] = lb_x_end
                else:
                    xpt_loc[s, k] = (k - 1) * nx
            bx = (deg - 1) * nx
            for j in range(deg):
                cols = []
                if j == 0:
                    cols.extend(lb_x_start + np.arange(nx))
                else:
                    cols.extend((j - 1) * nx + np.arange(nx))
                cols.extend(bx + j * nu + np.arange(nu))
                cols.append(lb_t0)
                cols.append(lb_tf)
                cols.extend(lb_q + np.arange(nq))
                nloc[s, j] = cols
                drow_glob[s, j] = pl.con_offset + (start + j) * nx + np.arange(nx)
                if npath:
                    prow_glob[s, j] = (
                        pl.con_offset + pl.N * nx + (start + j) * npath
                        + np.arange(npath)
                    )
            # border positions of the local border slots
            bp = []
            bp.extend(xsep_base + s * nx + np.arange(nx))         # x_start
            bp.extend(xsep_base + (s + 1) * nx + np.arange(nx))   # x_end
            bp.append(t0_pos)
            bp.append(tf_pos)
            bp.extend(q_base + np.arange(nq))
            border_pos[s, : len(bp)] = bp
            border_mask[s, : len(bp)] = True
        epos = np.concatenate([
            xsep_base + np.arange(nx),                 # x0 = x at separator 0
            [t0_pos],
            xsep_base + S * nx + np.arange(nx),        # xf = x at separator S
            [tf_pos],
            q_base + np.arange(nq),
        ]).astype(np.int32)
        eoff = pl.con_offset + pl.N * (nx + npath)
        erow_glob = (eoff + np.arange(pl.nevent)).astype(np.int32)
        maps.append(_PhaseMaps(
            node_of=node_of, node_mask=node_mask,
            xpt_of=xpt_of, xpt_mask=xpt_mask,
            nloc=nloc, xpt_loc=xpt_loc,
            drow_glob=drow_glob, prow_glob=prow_glob,
            border_pos=border_pos, border_mask=border_mask,
            epos=epos, erow_glob=erow_glob, seg_off=seg_off, nseg=S,
        ))
        seg_off += S
        border_off = q_base + nq
    assert seg_off == spec.num_blocks
    assert border_off == spec.border_size
    return maps, lbmax


def _link_border_pos(problem, layout, maps):
    """Border positions of each linkage's inputs [xf_l, q_l, x0_r, q_r]."""
    out = []
    for link in problem.linkages:
        ml, mr = maps[link.left], maps[link.right]
        pll, plr = layout.phases[link.left], layout.phases[link.right]
        nxl, nql = pll.nx, pll.nq
        # epos layout: [x0 (nx), t0, xf (nx), tf, q (nq)]
        xf_l = ml.epos[nxl + 1 : 2 * nxl + 1]
        q_l = ml.epos[2 * nxl + 2 :]
        x0_r = mr.epos[: plr.nx]
        q_r = mr.epos[2 * plr.nx + 2 :]
        out.append(np.concatenate([xf_l, q_l, x0_r, q_r]).astype(np.int32))
    return out


def make_structured_kkt(problem: Problem, layout: Layout, spec: BlockKKTSpec) -> StructuredKKT:
    """Build the matrix-free structured-KKT closures for this layout/spec."""
    n, m = layout.nvar, layout.ncon
    maps, lbmax = _build_phase_maps(problem, layout, spec)
    bmax = spec.block_size
    nb = spec.border_size
    node_idx = [jnp.asarray(_node_indices(pl)) for pl in layout.phases]
    end_idx = [jnp.asarray(_endpoint_indices(pl)) for pl in layout.phases]
    link_idx = [jnp.asarray(_link_indices(layout, l)) for l in problem.linkages]
    lpos_list = [jnp.asarray(a) for a in _link_border_pos(problem, layout, maps)]
    border_idx = jnp.asarray(spec.border_idx)
    interior_idx = jnp.asarray(spec.interior_idx)
    interior_mask = jnp.asarray(spec.interior_mask)
    jac_blocks_raw = make_jac_blocks(problem, layout)
    hess_blocks_raw = make_hess_blocks(problem, layout)
    _, block_fsolve, block_fok = make_block_factorizer(spec)

    # static: linear rows' border Jacobian (±1 at t0/tf border positions)
    n_lin = len(problem.phases) + len(problem.linkages)
    Jlin = np.zeros((n_lin, nb))
    r = 0
    for p, (ph, mp) in enumerate(zip(problem.phases, maps)):
        t0_pos = int(mp.epos[layout.phases[p].nx])
        tf_pos = int(mp.epos[2 * layout.phases[p].nx + 1])
        Jlin[r, tf_pos] = 1.0
        Jlin[r, t0_pos] = -1.0
        r += 1
    for link in problem.linkages:
        mpl, mpr = maps[link.left], maps[link.right]
        tfl_pos = int(mpl.epos[2 * layout.phases[link.left].nx + 1])
        t0r_pos = int(mpr.epos[layout.phases[link.right].nx])
        Jlin[r, t0r_pos] = 1.0
        Jlin[r, tfl_pos] = -1.0
        r += 1
    Jlin_j = jnp.asarray(Jlin)
    lin_rows = jnp.arange(layout.linear_offset, layout.ncon)

    # per-phase linear-row variable indices for jv/jtv
    lin_var = np.zeros((n_lin, 2), np.int32)   # (+1 idx, -1 idx)
    r = 0
    for pl in layout.phases:
        lin_var[r] = (pl.tf_index, pl.t0_index)
        r += 1
    for link in problem.linkages:
        lin_var[r] = (
            layout.phases[link.right].t0_index, layout.phases[link.left].tf_index
        )
        r += 1
    lin_var_j = jnp.asarray(lin_var)

    def jac_blocks(z_raw, mesh, sc, vinv):
        phase_blocks, link_blocks = jac_blocks_raw(z_raw, mesh)
        return {
            "phase": phase_blocks,
            "link": link_blocks,
            "D": [jnp.asarray(D, z_raw.dtype) for (_, _, _, D) in mesh],
            "sc": sc,
            "vinv": vinv,
        }

    def hess_blocks(z_raw, lam_scaled, mesh, sf, sc, vinv):
        phase_h, link_h = hess_blocks_raw(z_raw, sc * lam_scaled, mesh, sf)
        return {"phase": phase_h, "link": link_h, "vinv": vinv}

    # ----- matvecs (scaled space: J_s = S_c J V^{-1}) -----
    def jv(jb, v):
        vr = jb["vinv"] * v
        rows = []
        for pl, pb, D, nidx, eidx in zip(
            layout.phases, jb["phase"], jb["D"], node_idx, end_idx
        ):
            Vx = vr[pl.x_slice].reshape(pl.npts, pl.nx)
            vn = vr[nidx]                                    # (N, nbn)
            defect = D @ Vx + jnp.einsum("nij,nj->ni", pb.dblocks, vn)
            rows.append(defect.reshape(-1))
            if pl.npath:
                rows.append(jnp.einsum("nij,nj->ni", pb.pblocks, vn).reshape(-1))
            if pl.nevent:
                rows.append(pb.eblock @ vr[eidx])
        for link, lb, lidx in zip(problem.linkages, jb["link"], link_idx):
            if link.nlink:
                rows.append(lb @ vr[lidx])
        rows.append(vr[lin_var_j[:, 0]] - vr[lin_var_j[:, 1]])
        return jb["sc"] * jnp.concatenate(rows)

    def jtv(jb, u):
        us = jb["sc"] * u
        out = jnp.zeros((n,), u.dtype)
        for pl, pb, D, nidx, eidx in zip(
            layout.phases, jb["phase"], jb["D"], node_idx, end_idx
        ):
            u_def = us[pl.con_offset : pl.con_offset + pl.N * pl.nx].reshape(
                pl.N, pl.nx
            )
            out = out.at[pl.x_slice].add((D.T @ u_def).reshape(-1))
            acc = jnp.einsum("nij,ni->nj", pb.dblocks, u_def)
            if pl.npath:
                poff = pl.con_offset + pl.N * pl.nx
                u_p = us[poff : poff + pl.N * pl.npath].reshape(pl.N, pl.npath)
                acc = acc + jnp.einsum("nij,ni->nj", pb.pblocks, u_p)
            out = out.at[nidx].add(acc)
            if pl.nevent:
                eoff = pl.con_offset + pl.N * (pl.nx + pl.npath)
                out = out.at[eidx].add(pb.eblock.T @ us[eoff : eoff + pl.nevent])
        for link, loff, lb, lidx in zip(
            problem.linkages, layout.link_offsets, jb["link"], link_idx
        ):
            if link.nlink:
                out = out.at[lidx].add(lb.T @ us[loff : loff + link.nlink])
        u_lin = us[lin_rows]
        out = out.at[lin_var_j[:, 0]].add(u_lin)
        out = out.at[lin_var_j[:, 1]].add(-u_lin)
        return jb["vinv"] * out

    def hv(hb, v):
        vr = hb["vinv"] * v
        out = jnp.zeros((n,), v.dtype)
        for phb, nidx, eidx in zip(hb["phase"], node_idx, end_idx):
            out = out.at[nidx].add(
                jnp.einsum("nij,nj->ni", phb.hblocks, vr[nidx])
            )
            out = out.at[eidx].add(phb.hend @ vr[eidx])
        for link, hl, lidx in zip(problem.linkages, hb["link"], link_idx):
            if link.nlink:
                out = out.at[lidx].add(hl @ vr[lidx])
        return hb["vinv"] * out

    # ----- direct block assembly -----
    S_total = spec.num_blocks
    bl = bmax + lbmax
    maps_j = [
        jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, mp
        )
        for mp in maps
    ]

    def assemble(jb, hb, d, wdiag):
        sc, vinv = jb["sc"], jb["vinv"]
        dtype = d.dtype
        A_parts, B_parts = [], []
        C = jnp.zeros((nb, nb), dtype)
        C = C + jnp.diag(wdiag[border_idx])
        for p, (ph, pl, mp, pb, phb, D, nidx, eidx) in enumerate(zip(
            problem.phases, layout.phases, maps_j, jb["phase"], hb["phase"],
            jb["D"], node_idx, end_idx
        )):
            S = mp.node_of.shape[0]
            degmax = mp.node_of.shape[1]
            nx, npath = pl.nx, pl.npath
            nbn = nidx.shape[1]
            nmask = mp.node_mask.astype(dtype)
            # scaled per-node blocks gathered per segment
            vinv_n = vinv[nidx]                              # (N, nbn)
            sc_def = sc[pl.con_offset : pl.con_offset + pl.N * nx].reshape(pl.N, nx)
            db_s = pb.dblocks * sc_def[:, :, None] * vinv_n[:, None, :]
            db = db_s[mp.node_of] * nmask[:, :, None, None]  # (S, degmax, nx, nbn)
            hb_s = phb.hblocks * vinv_n[:, :, None] * vinv_n[:, None, :]
            hbg = hb_s[mp.node_of] * nmask[:, :, None, None]
            # scaled D values over support
            vinv_x = vinv[pl.x_slice].reshape(pl.npts, nx)
            dvals = D[mp.node_of[:, :, None], mp.xpt_of[:, None, :]]
            dvals = dvals * nmask[:, :, None] * mp.xpt_mask.astype(dtype)[:, None, :]
            # (S, degmax, degmax+1, nx): row scale (node,i), col scale (pt,i)
            dv = (
                dvals[:, :, :, None]
                * sc_def[mp.node_of][:, :, None, :]
                * vinv_x[mp.xpt_of][:, None, :, :]
            )
            sidx = jnp.arange(S)[:, None, None, None]
            # per-segment local stiffness assembly: sharded along S when a
            # segment-sharding policy is active (parallel/segment.py)
            Jloc = seg_constrain(jnp.zeros((S, degmax * (nx + npath), bl), dtype))
            rowsD = (
                jnp.arange(degmax)[None, :, None, None] * nx
                + jnp.arange(nx)[None, None, None, :]
            )
            colsD = mp.xpt_loc[:, None, :, None] + jnp.arange(nx)[None, None, None, :]
            Jloc = Jloc.at[sidx, rowsD, colsD].add(dv)
            rowsN = (
                jnp.arange(degmax)[None, :, None, None] * nx
                + jnp.arange(nx)[None, None, :, None]
            )
            colsN = mp.nloc[:, :, None, :]
            Jloc = Jloc.at[sidx, rowsN, colsN].add(db)
            dloc_def = (d[mp.drow_glob] * nmask[:, :, None]).reshape(S, degmax * nx)
            if npath:
                pb_s = pb.pblocks * sc[
                    pl.con_offset + pl.N * nx : pl.con_offset + pl.N * (nx + npath)
                ].reshape(pl.N, npath)[:, :, None] * vinv_n[:, None, :]
                pbg = pb_s[mp.node_of] * nmask[:, :, None, None]
                rowsP = (
                    degmax * nx
                    + jnp.arange(degmax)[None, :, None, None] * npath
                    + jnp.arange(npath)[None, None, :, None]
                )
                Jloc = Jloc.at[sidx, rowsP, colsN].add(pbg)
                dloc_p = (d[mp.prow_glob] * nmask[:, :, None]).reshape(
                    S, degmax * npath
                )
                dloc = jnp.concatenate([dloc_def, dloc_p], axis=1)
            else:
                dloc = dloc_def
            Kloc = seg_constrain(jnp.einsum("srb,sr,src->sbc", Jloc, dloc, Jloc))
            sidx3 = jnp.arange(S)[:, None, None, None]
            Kloc = Kloc.at[
                sidx3, mp.nloc[:, :, :, None], mp.nloc[:, :, None, :]
            ].add(hbg)
            # interior part + Sigma diag + pad identity
            A_p = Kloc[:, :bmax, :bmax]
            imask = interior_mask[mp.seg_off : mp.seg_off + S]
            iidx = interior_idx[mp.seg_off : mp.seg_off + S]
            diag_int = jnp.where(imask, wdiag[iidx], 1.0)
            A_p = A_p + jax.vmap(jnp.diag)(diag_int)
            A_parts.append(A_p)
            # border coupling
            BL = Kloc[:, bmax:, :bmax]                       # (S, lbmax, bmax)
            B_p = jnp.zeros((S, nb, bmax), dtype)
            B_p = B_p.at[
                jnp.arange(S)[:, None, None],
                mp.border_pos[:, :, None],
                jnp.arange(bmax)[None, None, :],
            ].add(BL * mp.border_mask.astype(dtype)[:, :, None])
            B_parts.append(B_p)
            CL = Kloc[:, bmax:, bmax:]
            bm = mp.border_mask.astype(dtype)
            C = C.at[mp.border_pos[:, :, None], mp.border_pos[:, None, :]].add(
                CL * bm[:, :, None] * bm[:, None, :]
            )
            # endpoint Hessian + event rows (border-only)
            hend_s = phb.hend * vinv[eidx][:, None] * vinv[eidx][None, :]
            C = C.at[mp.epos[:, None], mp.epos[None, :]].add(hend_s)
            if pl.nevent:
                sc_ev = sc[mp.erow_glob]
                eb_s = pb.eblock * sc_ev[:, None] * vinv[eidx][None, :]
                d_ev = d[mp.erow_glob]
                C = C.at[mp.epos[:, None], mp.epos[None, :]].add(
                    jnp.einsum("ri,r,rj->ij", eb_s, d_ev, eb_s)
                )
        # linkage rows + Hessians (border-only)
        for link, loff, lb_, hl, lidx, lpos in zip(
            problem.linkages, layout.link_offsets, jb["link"], hb["link"],
            link_idx, lpos_list
        ):
            if link.nlink == 0:
                continue
            sc_l = sc[loff : loff + link.nlink]
            lb_s = lb_ * sc_l[:, None] * vinv[lidx][None, :]
            d_l = d[loff : loff + link.nlink]
            hl_s = hl * vinv[lidx][:, None] * vinv[lidx][None, :]
            C = C.at[lpos[:, None], lpos[None, :]].add(
                jnp.einsum("ri,r,rj->ij", lb_s, d_l, lb_s) + hl_s
            )
        # linear rows (border-only; static ±1 pattern, scaled)
        sc_lin = sc[lin_rows]
        vinv_b = vinv[border_idx]
        Jlin_s = sc_lin[:, None] * Jlin_j * vinv_b[None, :]
        C = C + jnp.einsum("ri,r,rj->ij", Jlin_s, d[lin_rows], Jlin_s)
        A = jnp.concatenate(A_parts, axis=0)
        B = jnp.concatenate(B_parts, axis=0)
        return A, B, C

    def factorize(jbk, hbk, d, wdiag):
        return factor_from_blocks(*assemble(jbk, hbk, d, wdiag))

    return StructuredKKT(
        jac_blocks=jac_blocks, hess_blocks=hess_blocks,
        jv=jv, jtv=jtv, hv=hv,
        assemble=assemble, factorize=factorize,
        fsolve=block_fsolve, factor_ok=block_fok,
    )


def bind_structured_kkt(
    sk: StructuredKKT, mesh, sf, sc, vinv
) -> BoundKKT:
    """Bake mesh + scaling into the IPM-facing closures. ``z`` entering the
    bound closures is in SCALED space (z_s = v z ⇒ raw z = vinv * z_s)."""
    sc = jnp.asarray(sc)
    vinv = jnp.asarray(vinv)

    def jb(z_s):
        return sk.jac_blocks(vinv * z_s, mesh, sc, vinv)

    def hbk(z_s, lam):
        return sk.hess_blocks(vinv * z_s, lam, mesh, sf, sc, vinv)

    return BoundKKT(
        jac_blocks=jb, hess_blocks=hbk, jv=sk.jv, jtv=sk.jtv, hv=sk.hv,
        factorize=sk.factorize, fsolve=sk.fsolve, factor_ok=sk.factor_ok,
    )
