"""Schur-complement normal-equation backend for bipartite (camera-landmark)
problems.

The reference exposes no Schur solver (its sparse backends factor the full
AtA); for bundle-adjustment-shaped problems the TPU-native approach is to
eliminate the block-diagonal landmark subsystem in closed form and solve the
small dense reduced camera system on the MXU:

    [Hcc  Hcp][xc]   [bc]        S = Hcc - Hcp Hpp^-1 Hpc
    [Hpc  Hpp][xp] = [bp]  =>    S xc = bc - Hcp Hpp^-1 bp
                                 xp = Hpp^-1 (bp - Hpc xc)

All landmark inverses are batched d<=8 Cholesky solves (ops/batched_linalg),
the S assembly is per-point padded einsums + one-hot matmuls, and the reduced
solve is one batched dense Cholesky. Shares the block AtA assembly with the
sparse backend, so damping and custom gradients behave identically.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..core.compiled import CompiledObjective
from ..ops.batched_linalg import chol_small, solve_lower_vec, solve_upper_vec
from ..sparse.assemble import apply_block_damping, assemble, build_block_pattern


def _chol_solve_vec(l, b):
    return solve_upper_vec(jnp.swapaxes(l, -1, -2), solve_lower_vec(l, b))


# one-hot matmuls put segment reductions on the MXU, but the one-hot constant
# is (n_out, k): beyond this budget fall back to scatter-add (at 128x4000 BA
# the S-assembly one-hot would otherwise be a multi-GB trace-time constant)
_ONEHOT_MAX_ELEMS = 1 << 22


def _seg_sum(values, idx, n_out, dtype):
    """sum values (k, ...) into (n_out, ...) rows by static idx (k,)."""
    k = values.shape[0]
    if n_out * k <= _ONEHOT_MAX_ELEMS:
        onehot = np.zeros((n_out, k), np.float32)
        onehot[idx, np.arange(k)] = 1.0
        flat = values.reshape(k, -1)
        return jnp.einsum(
            "st,tf->sf", jnp.asarray(onehot, dtype), flat
        ).reshape((n_out,) + values.shape[1:])
    out = jnp.zeros((n_out,) + values.shape[1:], dtype=dtype)
    return out.at[idx].add(values)


def _chol_solve_mat(l, m):
    """Solve (L L^T) X = M for M (..., d, k) via column solves."""
    y = jax.vmap(lambda col: _chol_solve_vec(l, col), in_axes=-1, out_axes=-1)(m)
    return y


class SchurNormal:
    def __init__(self, builder: "SchurNormalBuilder", ata, atb_blocks):
        self.builder = builder
        self.ata = ata
        self.atb_blocks = atb_blocks
        self.Atb = builder.flatten(atb_blocks)

    # quad/diag shared with the sparse backend's block formulas
    def quad(self, v):
        bld = self.builder
        vb = bld.unflatten(v)
        vi, vj = vb[bld.bw_ii], vb[bld.bw_jj]
        blocks = self.ata[bld.bw_slots]
        terms = jnp.einsum("sbi,sbij,sbj->sb", vi, blocks, vj)
        w = jnp.where(jnp.asarray(bld.bw_isdiag), 1.0, 2.0)[:, None]
        return jnp.sum(terms * w, axis=0)

    def diag(self):
        bld = self.builder
        dblocks = self.ata[1 : bld.pattern.n_vars + 1]
        dd = jnp.diagonal(dblocks, axis1=-2, axis2=-1)
        return bld.flatten(dd)

    def solve(self, damping=0.0, ellipsoidal=False, rhs_shift=None):
        bld = self.builder
        ata = apply_block_damping(bld.pattern, self.ata, damping, ellipsoidal,
                                  bld.damping_eps)
        rhs = self.atb_blocks
        if rhs_shift is not None:
            rhs = rhs - bld.unflatten(rhs_shift)
        bsz = rhs.shape[1]
        dtype = rhs.dtype

        # factor once (Hpp block Choleskys + reduced-camera Cholesky), then
        # apply to the rhs; the same apply closure serves the
        # iterative-refinement sweeps (sparse/refine.py) so the Schur path
        # honors the same f64-solve precision contract as the generic
        # sparse backend (reference baspacho_sparse_autograd.py:41)
        apply_fn = self._prepare_apply(ata, bsz, dtype)
        x_blocks = apply_fn(rhs)

        from .. import config as _config
        from ..sparse.refine import refine_active

        if refine_active(dtype):
            from ..sparse.refine import block_matvec, hp_dtype, refine

            tables = bld.matvec_tables()
            hp = hp_dtype(dtype)
            x_blocks = refine(
                apply_fn,
                lambda xv: block_matvec(tables, ata, xv, hp),
                rhs, x_blocks, _config.REFINE_STEPS,
            )

        delta = bld.flatten(x_blocks)
        bad = jnp.any(~jnp.isfinite(delta), axis=-1)
        delta = jnp.where(bad[..., None], 0.0, delta)
        return delta, bad

    def _prepare_apply(self, ata, bsz, dtype):
        """Eliminate the landmark subsystem and factor the reduced camera
        system; returns apply(rhs_blocks (n, B, d)) -> x_blocks (n, B, d).

        Mixed-dof slicing on BOTH axes: landmark blocks run at the true max
        point dof dp and camera blocks at the true max camera dof dc (both
        <= the uniform pad d). At BA scale (cam dof 6, point dof 3, d = 6)
        the dp-slice halves the dominant W*Hcp^T GEMM contraction dim; the
        dc-slice is the analogous guard for problems where a non-camera
        variable inflates d. Padding dims carry identity diagonals + zero
        off-diagonals/rhs, so both slices are exact."""
        bld = self.builder
        d = bld.pattern.d
        C, P = len(bld.cam_vars), len(bld.pt_vars)
        dp = bld.pt_d
        dc = bld.cam_d

        # landmark block inverses via small Cholesky
        hpp = ata[bld.pt_diag_slots][..., :dp, :dp]  # (P, B, dp, dp)
        lpp = chol_small(0.5 * (hpp + jnp.swapaxes(hpp, -1, -2)))

        # cp blocks oriented (cam rows, point cols), sliced to (dc, dp)
        hcp = ata[bld.cp_slots]  # (O, B, d, d)
        hcp = jnp.where(bld.cp_tr[:, None, None, None], jnp.swapaxes(hcp, -1, -2), hcp)
        hcp = hcp[..., :dc, :dp]  # (O, B, dc, dp)

        # W_o = Hcp_o Hpp_{p(o)}^{-1}
        lo = lpp[bld.cp_pt]  # (O, B, dp, dp)
        w = jnp.swapaxes(
            _chol_solve_mat(lo, jnp.swapaxes(hcp, -1, -2)), -1, -2
        )  # (O, B, dc, dp)

        # dense Hcc (B, C*dc, C*dc) from cc slots
        hcc = jnp.zeros((bsz, C, C, dc, dc), dtype=dtype)
        cc_blocks = ata[bld.cc_slots]  # (Ncc, B, d, d)
        cc_blocks = jnp.where(
            bld.cc_tr[:, None, None, None], jnp.swapaxes(cc_blocks, -1, -2), cc_blocks
        )[..., :dc, :dc]
        cc_b = jnp.moveaxis(cc_blocks, 1, 0)  # (B, Ncc, dc, dc)
        hcc = hcc.at[:, bld.cc_i, bld.cc_j].add(cc_b)
        off = bld.cc_i != bld.cc_j
        hcc = hcc.at[:, bld.cc_j[off], bld.cc_i[off]].add(
            jnp.swapaxes(cc_b[:, off], -1, -2)
        )

        if bld.use_dense_elimination(bsz, dtype):
            # MXU path: densify W and Hcp as (B, C*dc, P*dp) and compute the
            # whole S update + reduced rhs + landmark back-substitution as
            # three batched GEMMs. Zero blocks (non-observed pairs) cost
            # FLOPs but the systolic array wins by orders of magnitude over
            # per-point gather/scatter at BA scale.
            def to2d(blocks):  # (O, B, dc, dp) -> (B, C*dc, P*dp)
                dd = jnp.zeros((C, P, bsz, dc, dp), dtype=dtype)
                dd = dd.at[bld.cp_cam, bld.cp_pt].set(blocks)
                return jnp.moveaxis(dd, 2, 0).transpose(0, 1, 3, 2, 4).reshape(
                    bsz, C * dc, P * dp
                )

            W2 = to2d(w)
            H2 = to2d(hcp)
            s_upd2 = jnp.einsum("bcp,bqp->bcq", W2, H2)  # (B, Cdc, Cdc)
            s_mat = jnp.swapaxes(hcc, 2, 3).reshape(bsz, C * dc, C * dc) - s_upd2
            ls = jnp.linalg.cholesky(s_mat)

            def apply_fn(rhs):
                bp = rhs[bld.pt_vars_np][..., :dp]  # (P, B, dp)
                bc = rhs[bld.cam_vars_np][..., :dc]  # (C, B, dc)
                bp_flat = jnp.moveaxis(bp, 0, 1).reshape(bsz, P * dp)
                red_flat = jnp.einsum("bcp,bp->bc", W2, bp_flat)  # (B, Cdc)
                rc_flat = jnp.moveaxis(bc, 0, 1).reshape(bsz, C * dc) - red_flat
                xc_flat = jsl.cho_solve((ls, True), rc_flat[..., None])[..., 0]
                xc = jnp.moveaxis(xc_flat.reshape(bsz, C, dc), 1, 0)  # (C, B, dc)
                hx_flat = jnp.einsum("bcp,bc->bp", H2, xc_flat)  # (B, P*dp)
                acc = jnp.moveaxis(hx_flat.reshape(bsz, P, dp), 1, 0)
                xp = _chol_solve_vec(lpp, bp - acc)  # (P, B, dp)
                return self._scatter_x(xc, xp, bsz, dtype)

            return apply_fn

        # chunked path: S -= sum over points of W_k H_l^T for camera
        # pairs (k, l) of point p, as a lax.scan over fixed-size point
        # chunks (compiled-program size is O(1) in P; the pair tensor
        # (Pc, K, K, B, dc, dc) stays bounded per chunk)
        ppad_obs, ppad_valid, campair = bld.ppad_tables()
        K = ppad_obs.shape[1]
        per_pt = max(1, K * K * bsz * dc * dc * 4)
        chunk = max(1, min(P, (256 << 20) // per_pt))
        n_chunks = (P + chunk - 1) // chunk
        Ppad = n_chunks * chunk
        pad = Ppad - P

        obs_x = np.concatenate(
            [ppad_obs, np.zeros((pad, K), np.int32)]
        ).reshape(n_chunks, chunk, K)
        val_x = np.concatenate(
            [ppad_valid, np.zeros((pad, K), bool)]
        ).reshape(n_chunks, chunk, K)
        pair_x = np.concatenate(
            [campair, np.full((pad, K * K), C * C, np.int32)]
        ).reshape(n_chunks, chunk, K * K)

        def body(s_acc, x):
            obs_c, val_c, pair_c = x
            vmask = val_c[:, :, None, None, None]
            wg = jnp.where(vmask, w[obs_c], 0.0)  # (Pc,K,B,dc,dp)
            hg = jnp.where(vmask, hcp[obs_c], 0.0)
            pair_s = jnp.einsum("pkbij,plbmj->pklbim", wg, hg)
            s_acc = s_acc.at[pair_c.reshape(-1)].add(
                pair_s.reshape(-1, bsz, dc, dc)
            )
            return s_acc, None

        s_acc0 = jnp.zeros((C * C + 1, bsz, dc, dc), dtype=dtype)
        s_acc, _ = jax.lax.scan(
            body,
            s_acc0,
            (jnp.asarray(obs_x), jnp.asarray(val_x), jnp.asarray(pair_x)),
        )
        s_upd = s_acc[:-1].reshape(C, C, bsz, dc, dc)
        hcc = hcc - jnp.moveaxis(s_upd, 2, 0)
        s_mat = jnp.swapaxes(hcc, 2, 3).reshape(bsz, C * dc, C * dc)
        ls = jnp.linalg.cholesky(s_mat)

        def apply_fn(rhs):
            bp = rhs[bld.pt_vars_np][..., :dp]  # (P, B, dp)
            bc = rhs[bld.cam_vars_np][..., :dc]  # (C, B, dc)
            # reduced rhs: bc - sum W_o bp_{p(o)} scattered at cam(o)
            wb = jnp.einsum("obij,obj->obi", w, bp[bld.cp_pt])  # (O, B, dc)
            red = _seg_sum(wb, bld.cp_cam, C, dtype)
            rc_flat = jnp.moveaxis(bc - red, 0, 1).reshape(bsz, C * dc)
            xc_flat = jsl.cho_solve((ls, True), rc_flat[..., None])[..., 0]
            xc = jnp.moveaxis(xc_flat.reshape(bsz, C, dc), 1, 0)  # (C, B, dc)
            # back-substitute landmarks: xp = Hpp^-1 (bp - Hpc xc)
            hx = jnp.einsum("obji,obj->obi", hcp, xc[bld.cp_cam])  # (O, B, dp)
            acc = _seg_sum(hx, bld.cp_pt, P, dtype)
            xp = _chol_solve_vec(lpp, bp - acc)  # (P, B, dp)
            return self._scatter_x(xc, xp, bsz, dtype)

        return apply_fn

    def _scatter_x(self, xc, xp, bsz, dtype):
        """(C, B, dc) camera + (P, B, dp) landmark deltas -> (n, B, d)."""
        bld = self.builder
        d = bld.pattern.d
        dp, dc = bld.pt_d, bld.cam_d
        if dp < d:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, d - dp)))
        if dc < d:
            xc = jnp.pad(xc, ((0, 0), (0, 0), (0, d - dc)))
        x_blocks = jnp.zeros((bld.pattern.n_vars, bsz, d), dtype=dtype)
        x_blocks = x_blocks.at[bld.cam_vars_np].set(xc)
        x_blocks = x_blocks.at[bld.pt_vars_np].set(xp)
        return x_blocks


class SchurNormalBuilder:
    """eliminate: predicate(name, group) -> True for landmark-style vars."""

    def __init__(self, co: CompiledObjective, eliminate, damping_eps: float = 1e-8):
        self.co = co
        self.damping_eps = damping_eps
        self.pattern = build_block_pattern(co)
        n, d = self.pattern.n_vars, self.pattern.d

        elim = np.zeros(n, dtype=bool)
        for i, name in enumerate(co.var_names):
            elim[i] = bool(eliminate(name, co.var_groups[name]))
        self.elim = elim
        self.cam_vars = [i for i in range(n) if not elim[i]]
        self.pt_vars = [i for i in range(n) if elim[i]]
        if not self.pt_vars:
            raise ValueError("Schur backend: nothing to eliminate.")
        self.cam_vars_np = np.asarray(self.cam_vars)
        self.pt_vars_np = np.asarray(self.pt_vars)
        # true max dofs per side: the elimination runs on (dc, dp)-sliced
        # blocks (points dof 3 vs uniform pad d=6 at BA shapes halves the
        # W GEMM + densified footprint; dc guards the camera axis when a
        # non-camera variable inflates the uniform pad d)
        self.pt_d = int(self.pattern.var_dofs[self.pt_vars_np].max())
        self.cam_d = (
            int(self.pattern.var_dofs[self.cam_vars_np.astype(np.int64)].max())
            if len(self.cam_vars) else d
        )
        self._matvec_tables = None
        cam_index = {v: i for i, v in enumerate(self.cam_vars)}
        pt_index = {v: i for i, v in enumerate(self.pt_vars)}

        cc, cp = [], []
        for (i, j), slot in self.pattern.pair_slot.items():
            if i == j:
                continue
            ei, ej = elim[i], elim[j]
            if ei and ej:
                raise ValueError(
                    "Schur backend requires no costs coupling two eliminated "
                    f"variables (found pair {co.var_names[i]}, {co.var_names[j]})."
                )
            if not ei and not ej:
                # stored rows=i (canonical i<j); orient rows=min-cam for det.
                cc.append((slot, cam_index[i], cam_index[j], False))
            else:
                cam, pt = (i, j) if ej else (j, i)
                # stored block has rows = min(i, j); we want rows = cam
                needs_t = cam > pt
                cp.append((slot, cam_index[cam], pt_index[pt], needs_t))

        C = len(self.cam_vars)
        self.cc_slots = np.asarray([x[0] for x in cc] + [self.pattern.pair_slot[(v, v)] for v in self.cam_vars], dtype=np.int32)
        self.cc_i = np.asarray([x[1] for x in cc] + list(range(C)), dtype=np.int32)
        self.cc_j = np.asarray([x[2] for x in cc] + list(range(C)), dtype=np.int32)
        self.cc_tr = np.zeros(len(self.cc_slots), dtype=bool)

        self.cp_slots = np.asarray([x[0] for x in cp], dtype=np.int32)
        self.cp_cam = np.asarray([x[1] for x in cp], dtype=np.int32)
        self.cp_pt = np.asarray([x[2] for x in cp], dtype=np.int32)
        self.cp_tr = np.asarray([x[3] for x in cp], dtype=bool)

        self.pt_diag_slots = np.asarray(
            [self.pattern.pair_slot[(v, v)] for v in self.pt_vars], dtype=np.int32
        )

        self._ppad = None  # per-point padded tables, built lazily (chunk path)

        # flatten tables (global tangent layout, same as sparse backend)
        sel = []
        for i, dv in enumerate(self.pattern.var_dofs):
            sel.extend(range(i * d, i * d + int(dv)))
        self._sel = np.asarray(sel)
        self._n_total_pad = n * d
        self.total_dof = len(sel)

        items = sorted(self.pattern.pair_slot.items(), key=lambda kv: kv[1])
        self.bw_ii = np.array([k[0] for k, _ in items])
        self.bw_jj = np.array([k[1] for k, _ in items])
        self.bw_slots = np.array([s for _, s in items])
        self.bw_isdiag = self.bw_ii == self.bw_jj

    def matvec_tables(self):
        """Gather tables for the iterative-refinement block SpMV."""
        if self._matvec_tables is None:
            from ..sparse.refine import matvec_tables

            self._matvec_tables = matvec_tables(self.pattern.pair_slot)
        return self._matvec_tables

    def use_dense_elimination(self, bsz: int, dtype) -> bool:
        """True when densified W/Hcp (B, C*dc, P*dp) fit the config budget."""
        from .. import config as _config

        C, P = len(self.cam_vars), len(self.pt_vars)
        itemsize = jnp.dtype(dtype).itemsize
        # W2, H2, plus one matmul transient of the same size
        return 3 * bsz * (C * self.cam_d) * (P * self.pt_d) * itemsize <= (
            _config.SCHUR_DENSE_BUDGET_BYTES
        )

    def ppad_tables(self):
        """(ppad_obs (P, K), ppad_valid (P, K), campair (P, K*K)) — padded
        per-point observation tables for the chunked S update; built lazily
        and vectorized (the dense-elimination path never needs them)."""
        if self._ppad is not None:
            return self._ppad
        C, P = len(self.cam_vars), len(self.pt_vars)
        O = len(self.cp_pt)
        counts = np.bincount(self.cp_pt, minlength=P)
        K = max(1, int(counts.max()) if O else 1)
        order = np.argsort(self.cp_pt, kind="stable")
        starts = np.cumsum(counts) - counts
        pos = np.arange(O) - starts[self.cp_pt[order]]
        ppad_obs = np.zeros((P, K), dtype=np.int32)
        ppad_valid = np.zeros((P, K), dtype=bool)
        ppad_obs[self.cp_pt[order], pos] = order
        ppad_valid[self.cp_pt[order], pos] = True
        cam_at = np.where(ppad_valid, self.cp_cam[ppad_obs], 0)  # (P, K)
        pairv = ppad_valid[:, :, None] & ppad_valid[:, None, :]
        campair = np.where(
            pairv, cam_at[:, :, None] * C + cam_at[:, None, :], C * C
        ).reshape(P, K * K)
        self._ppad = (ppad_obs, ppad_valid, campair)
        return self._ppad

    def flatten(self, blocks):
        bsz = blocks.shape[1]
        flat = jnp.moveaxis(blocks, 0, 1).reshape(bsz, self._n_total_pad)
        return flat[:, self._sel]

    def unflatten(self, v):
        bsz = v.shape[0]
        flat = jnp.zeros((bsz, self._n_total_pad), dtype=v.dtype)
        flat = flat.at[:, self._sel].set(v)
        return jnp.moveaxis(
            flat.reshape(bsz, self.pattern.n_vars, self.pattern.d), 1, 0
        )

    def build(self, state, aux, detach_hessian: bool = False) -> SchurNormal:
        blocks = self.co.linearize_blocks(state, aux)
        ata, atb = assemble(self.pattern, self.co, blocks)
        if detach_hessian:
            ata = jax.lax.stop_gradient(ata)
        return SchurNormal(self, ata, atb)


def eliminate_points(name: str, group) -> bool:
    """Default predicate: eliminate all Euclidean (Rn) variables."""
    return group.name.startswith("Rn")
