"""Batched block-sparse Cholesky: numeric factorization + solves + custom VJP.

The TPU-native replacement for BaSpaCho's numeric layer (reference
extlib/baspacho_solver.h:29-68 add_MtM/damp/factor/solve and the CUDA kernels
in baspacho_solver_cuda.cu). Design:

- One `lax.scan` over block columns (left-looking). Every elementary op is a
  *batched* (B, d, d) matmul / POTRF / TRSM, so the batch axis keeps the MXU
  fed even though the elimination order is sequential. Static padded gather
  tables from `structure.SymbolicFactor` make all shapes static; slot 0 of
  the flat block array is a zero sentinel (masked gathers) and scratch target
  (masked scatters always write zeros there).
- Triangular solves for the sub-diagonal blocks and both substitution passes
  are batched `jax.scipy.linalg.solve_triangular`.
- The linear-system solve is wrapped in `jax.custom_vjp` that REUSES the
  factorization in the backward pass — the same closed-form adjoint as the
  reference's sparse autograd functions (optimizer/autograd/common.py:11):
  h = H^-1 g, dAtb = h, dH_ij = -(h_i x_j^T + x_i h_j^T) on the stored
  pattern (diagonal blocks: -h_i x_i^T).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..ops.batched_linalg import (
    SMALL_DIM_MAX,
    chol_small,
    rt_solve_lower,
    solve_lower_vec,
    solve_upper_vec,
)
from .assemble import BlockPattern
from .structure import SymbolicFactor


def _chol(a, d):
    return chol_small(a) if d <= SMALL_DIM_MAX else jnp.linalg.cholesky(a)


def _col_rt_solve(ld, c_rest, d):
    """C_r @ Ld^{-T} for c_rest (..., R, B, d, d), ld (..., B, d, d)."""
    if d <= SMALL_DIM_MAX:
        return rt_solve_lower(jnp.expand_dims(ld, -4), c_rest)
    rhs = jnp.swapaxes(c_rest, -1, -2)
    out = jsl.solve_triangular(
        jnp.broadcast_to(jnp.expand_dims(ld, -4), rhs.shape), rhs, lower=True
    )
    return jnp.swapaxes(out, -1, -2)


def _fwd_sub(l, b, d):
    if d <= SMALL_DIM_MAX:
        return solve_lower_vec(l, b)
    return jsl.solve_triangular(l, b[..., None], lower=True)[..., 0]


def _bwd_sub(lt, b, d):
    """Solve L^T x = b given the transposed factor lt (upper)."""
    if d <= SMALL_DIM_MAX:
        return solve_upper_vec(lt, b)
    return jsl.solve_triangular(lt, b[..., None], lower=False)[..., 0]


MAX_LEVELS_FOR_LEVEL_SCHEDULE = 100


class NumericSchedule:
    """Static numpy index tables combining SymbolicFactor with BlockPattern.

    Two execution plans are prepared:
    - per-column `lax.scan` (general; sequential over n columns)
    - per-LEVEL batched sweeps (used when the elimination tree is shallow,
      e.g. after nested dissection): all columns of a level are eliminated by
      ONE batched gather/einsum/POTRF/TRSM group, so a 256-column chain costs
      ~log2(256) device steps instead of 256. Tables are padded per level
      (umax_l, rmax_l), eliminating most of the global-padding waste."""

    def __init__(self, sym: SymbolicFactor, pattern: BlockPattern):
        self.sym = sym
        self.pattern = pattern
        n = sym.n
        # dense trailing supernode (structure.py amalgamation): columns
        # n_head..n-1 are factored by one batched POTRF; all per-column /
        # per-level tables below cover the HEAD columns only, re-padded to
        # head-local maxima (padding to the dense tail's umax/rmax is the
        # 85x bipartite-graph cliff this design removes)
        self.n_head = sym.tail_start if sym.tail_start >= 0 else n
        self.tail_k = n - self.n_head
        nh = self.n_head

        # numpy (not jnp) storage everywhere: NumericSchedule rides through
        # custom_vjp nondiff_argnums / static closures, so its tables must be
        # host constants that re-embed per trace (device arrays here leak
        # tracers across traces)
        self.diag_slots = np.asarray(
            [sym.block_of[(j, j)] for j in range(nh)], dtype=np.int32
        )
        # int32 everywhere: Mosaic kernels reject 64-bit operands (relevant
        # when the process enables x64 for the refinement tier) and i64
        # tables would double every embedded gather constant's HLO bytes
        self.perm = np.asarray(sym.perm, dtype=np.int32)
        self.iperm = np.asarray(sym.iperm, dtype=np.int32)
        self._rect = None  # global rectangles, built lazily (see below)
        self._matvec_tables = None  # refinement SpMV tables, built lazily
        self._build_tail_tables()

        # ---- per-level plan ------------------------------------------
        # (levels computed in structure.py already exclude the dense tail)
        # level sweeps unroll one HLO segment per level (x3 with the two
        # substitution passes), so they only pay off when the tree is shallow
        # RELATIVE to n — otherwise the single-body scan compiles much faster
        # with similar runtime (e.g. near-dense BA camera blocks).
        self.use_levels = (
            sym.levels is not None
            and len(sym.levels) <= MAX_LEVELS_FOR_LEVEL_SCHEDULE
            and len(sym.levels) <= max(8, sym.n // 4)
        )
        self.level_tables = []
        if self.use_levels:
            for cols in sym.levels:
                self.level_tables.append(self._build_level_table(cols))
        # level RUNS: consecutive levels stacked into one lax.scan body each
        # (program size O(#runs) instead of O(#levels); config.LEVEL_RUNS)
        self.level_runs = (
            _build_level_runs(self.level_tables, n) if self.level_tables else []
        )

    def matvec_tables(self):
        """Gather tables for the iterative-refinement block SpMV."""
        if self._matvec_tables is None:
            from .refine import matvec_tables

            self._matvec_tables = matvec_tables(self.pattern.pair_slot)
        return self._matvec_tables

    def _build_level_table(self, cols):
        """Per-level tables built DIRECTLY from the symbolic lists, padded to
        level-local maxima. (Building global (nh, umax, rmax) rectangles and
        slicing them per level — the old path — allocated gigabytes at 10k+
        columns whenever one fat column inflated umax/rmax; per-level padding
        is O(exact fill).)"""
        sym, pattern = self.sym, self.pattern
        block_of = sym.block_of
        cols = np.asarray(cols, dtype=np.int32)
        C = len(cols)
        rmax_l = max(len(sym.col_rows[int(j)]) for j in cols)
        umax_l = max(1, max(len(sym.upd_lists[int(j)]) for j in cols))

        a_src = np.zeros((C, rmax_l), dtype=np.int32)
        a_tr = np.zeros((C, rmax_l), dtype=bool)
        valid = np.zeros((C, rmax_l), dtype=bool)
        col_slots = np.zeros((C, rmax_l), dtype=np.int32)
        row_ids = np.zeros((C, rmax_l), dtype=np.int32)
        row_valid = np.zeros((C, rmax_l), dtype=bool)
        upd_slots = np.zeros((C, umax_l, rmax_l), dtype=np.int32)
        jk_slots = np.zeros((C, umax_l), dtype=np.int32)
        upd_k = np.zeros((C, umax_l), dtype=np.int32)
        upd_valid = np.zeros((C, umax_l), dtype=bool)
        for idx, j in enumerate(cols):
            j = int(j)
            pj = int(sym.perm[j])
            rows = sym.col_rows[j]
            rpos = {int(r): t for t, r in enumerate(rows)}
            for t, r in enumerate(rows):
                r = int(r)
                pr = int(sym.perm[r])
                lo, hi = (pr, pj) if pr <= pj else (pj, pr)
                s = pattern.pair_slot.get((lo, hi), 0)
                a_src[idx, t] = s
                a_tr[idx, t] = pr > pj and s != 0
                valid[idx, t] = True
                col_slots[idx, t] = block_of[(r, j)]
                row_ids[idx, t] = r
                row_valid[idx, t] = True
            for u, k in enumerate(sym.upd_lists[j]):
                jk_slots[idx, u] = block_of[(j, k)]
                upd_k[idx, u] = k
                upd_valid[idx, u] = True
                for r in sym.col_rows[k]:
                    r = int(r)
                    if r in rpos:
                        upd_slots[idx, u, rpos[r]] = block_of[(r, k)]
        return {
            "cols": cols,
            "a_src": a_src,
            "a_tr": a_tr,
            "valid": valid,
            "col_slots": col_slots,
            "row_ids": row_ids,
            "row_valid": row_valid,
            "upd_slots": upd_slots,
            "jk_slots": jk_slots,
            "upd_k": upd_k,
            "upd_valid": upd_valid,
            "diag_slots": np.asarray(
                [sym.block_of[(int(j), int(j))] for j in cols], dtype=np.int32
            ),
        }

    # ---- global per-column rectangles (scan plan + pallas_whole) -------
    # Built lazily: the level plan never needs them, and at 10k+ columns
    # they are the dominant symbolic-analysis cost.
    def _build_rect(self):
        if self._rect is not None:
            return self._rect
        sym, pattern = self.sym, self.pattern
        block_of = sym.block_of
        nh = self.n_head
        rmax = max((len(sym.col_rows[j]) for j in range(nh)), default=1)
        umax = max((len(sym.upd_lists[j]) for j in range(nh)), default=1)
        umax = max(umax, 1)
        r = {
            "a_src": np.zeros((nh, rmax), dtype=np.int32),
            "a_tr": np.zeros((nh, rmax), dtype=bool),
            "valid": np.zeros((nh, rmax), dtype=bool),
            "col_slots": np.zeros((nh, rmax), dtype=np.int32),
            "col_row_ids": np.zeros((nh, rmax), dtype=np.int32),
            "row_valid": np.zeros((nh, rmax), dtype=bool),
            "upd_slots": np.zeros((nh, umax, rmax), dtype=np.int32),
            "upd_jk_slots": np.zeros((nh, umax), dtype=np.int32),
            "upd_k": np.zeros((nh, umax), dtype=np.int32),
            "upd_valid": np.zeros((nh, umax), dtype=bool),
        }
        for j in range(nh):
            pj = int(sym.perm[j])
            rows = sym.col_rows[j]
            rpos = {int(rr): t for t, rr in enumerate(rows)}
            for t, rr in enumerate(rows):
                rr = int(rr)
                pr = int(sym.perm[rr])
                lo, hi = (pr, pj) if pr <= pj else (pj, pr)
                s = pattern.pair_slot.get((lo, hi), 0)
                r["a_src"][j, t] = s
                r["a_tr"][j, t] = pr > pj and s != 0
                r["valid"][j, t] = True
                r["col_slots"][j, t] = block_of[(rr, j)]
                r["col_row_ids"][j, t] = rr
                r["row_valid"][j, t] = True
            for u, k in enumerate(sym.upd_lists[j]):
                r["upd_jk_slots"][j, u] = block_of[(j, k)]
                r["upd_k"][j, u] = k
                r["upd_valid"][j, u] = True
                for rr in sym.col_rows[k]:
                    rr = int(rr)
                    if rr in rpos:
                        r["upd_slots"][j, u, rpos[rr]] = block_of[(rr, k)]
        self._rect = r
        return r

    a_src = property(lambda self: self._build_rect()["a_src"])
    a_tr = property(lambda self: self._build_rect()["a_tr"])
    valid = property(lambda self: self._build_rect()["valid"])
    col_slots = property(lambda self: self._build_rect()["col_slots"])
    col_row_ids = property(lambda self: self._build_rect()["col_row_ids"])
    row_valid = property(lambda self: self._build_rect()["row_valid"])
    upd_slots = property(lambda self: self._build_rect()["upd_slots"])
    upd_jk_slots = property(lambda self: self._build_rect()["upd_jk_slots"])
    upd_k = property(lambda self: self._build_rect()["upd_k"])
    upd_valid = property(lambda self: self._build_rect()["upd_valid"])


    def _build_tail_tables(self):
        """Static tables for the dense trailing supernode.

        For tail column j (absolute cj = n_head + j):
        - tail_col_slots (K, K): Lflat slot of block (row n_head+r, cj),
          0 where r < j (strict upper of the supernode)
        - tail_a_src/a_tr (K, K): AtA slot + transpose flag per block
        - tail_upd_* (K, ue, ...): EXTERNAL left-looking updates, i.e. head
          columns k < n_head with L[cj, k] in the pattern (internal tail
          updates are subsumed by the dense POTRF)
        """
        if self.tail_k == 0:
            self.tail_ue = 0
            return
        sym, pattern = self.sym, self.pattern
        nh, K = self.n_head, self.tail_k
        block_of = sym.block_of

        ext = [
            [int(k) for k in sym.tail_ext_upd[j]] for j in range(K)
        ]
        ue = max(1, max((len(e) for e in ext), default=1))
        self.tail_ue = ue

        col_slots = np.zeros((K, K), dtype=np.int32)
        a_src = np.zeros((K, K), dtype=np.int32)
        a_tr = np.zeros((K, K), dtype=bool)
        valid = np.zeros((K, K), dtype=bool)
        upd_slots = np.zeros((K, ue, K), dtype=np.int32)
        upd_jk = np.zeros((K, ue), dtype=np.int32)
        upd_k = np.zeros((K, ue), dtype=np.int32)
        upd_valid = np.zeros((K, ue), dtype=bool)
        for j in range(K):
            cj = nh + j
            pj = int(sym.perm[cj])
            for r in range(j, K):
                cr = nh + r
                col_slots[j, r] = block_of[(cr, cj)]
                valid[j, r] = True
                pr = int(sym.perm[cr])
                lo, hi = (pr, pj) if pr <= pj else (pj, pr)
                s = pattern.pair_slot.get((lo, hi), 0)
                a_src[j, r] = s
                a_tr[j, r] = pr > pj and s != 0
            for u, k in enumerate(ext[j]):
                upd_jk[j, u] = block_of[(cj, k)]
                upd_k[j, u] = k
                upd_valid[j, u] = True
                for r in range(j, K):
                    upd_slots[j, u, r] = block_of.get((nh + r, k), 0)

        self.tail_col_slots = col_slots
        self.tail_a_src = a_src
        self.tail_a_tr = a_tr
        self.tail_valid = valid
        self.tail_upd_slots = upd_slots
        self.tail_upd_jk = upd_jk
        self.tail_upd_k = upd_k
        self.tail_upd_valid = upd_valid


def _build_level_runs(level_tables, n):
    """Greedily group CONSECUTIVE levels into runs whose stacked padded
    tables stay within config.LEVEL_RUN_WASTE x the exact gather volume
    (order between levels is a hard dependency, so only adjacent levels can
    share a scan). Each run stacks the per-level tables along a leading L
    axis, padded to the run maxima; padded columns point their scatter at
    the zero sentinel (slot 0) and their solve row at the sentinel row `n`.
    Returns a list of dicts with stacked numpy tables + run dims."""
    from .. import config as _config

    kappa = float(_config.LEVEL_RUN_WASTE)

    def vol(c, r, u):
        return c * (u * r + r + u)

    groups: list = []
    cur: list = []

    def dims(levels):
        return (
            max(t["cols"].shape[0] for t in levels),
            max(t["a_src"].shape[1] for t in levels),
            max(t["upd_slots"].shape[1] for t in levels),
        )

    for t in level_tables:
        trial = cur + [t]
        C, R, U = dims(trial)
        exact = sum(
            vol(x["cols"].shape[0], x["a_src"].shape[1],
                x["upd_slots"].shape[1])
            for x in trial
        )
        if cur and len(trial) * vol(C, R, U) > kappa * exact:
            groups.append(cur)
            cur = [t]
        else:
            cur = trial
    if cur:
        groups.append(cur)

    runs = []
    for g in groups:
        C, R, U = dims(g)
        L = len(g)

        def stack(key, shape_fn, fill=0, dtype=None):
            out = np.full((L,) + shape_fn, fill,
                          dtype=dtype or g[0][key].dtype)
            for i, t in enumerate(g):
                a = t[key]
                out[(i,) + tuple(slice(0, s) for s in a.shape)] = a
            return out

        runs.append(
            {
                "L": L, "C": C, "R": R, "U": U,
                "cols": stack("cols", (C,), fill=n),  # sentinel row n
                "a_src": stack("a_src", (C, R)),
                "a_tr": stack("a_tr", (C, R), fill=False),
                "valid": stack("valid", (C, R), fill=False),
                "col_slots": stack("col_slots", (C, R)),
                "row_ids": stack("row_ids", (C, R)),
                "row_valid": stack("row_valid", (C, R), fill=False),
                "upd_slots": stack("upd_slots", (C, U, R)),
                "jk_slots": stack("jk_slots", (C, U)),
                "upd_k": stack("upd_k", (C, U)),
                "upd_valid": stack("upd_valid", (C, U), fill=False),
                "diag_slots": stack("diag_slots", (C,)),
            }
        )
    return runs


def _use_runs(sched: "NumericSchedule") -> bool:
    from .. import config as _config

    if not sched.use_levels or not sched.level_runs:
        return False
    mode = _config.LEVEL_RUNS
    if mode is True:
        return True
    if mode is False:
        return False
    return len(sched.level_tables) >= _config.LEVEL_RUN_MIN_LEVELS


def _tail_dense_blocks_to_mat(C, valid, K, d):
    """C (K_col, K_row, B, d, d) masked lower blocks -> dense (B, K*d, K*d)
    lower-triangular-by-blocks matrix (strict upper zero)."""
    bsz = C.shape[2]
    C = jnp.where(valid[:, :, None, None, None], C, 0.0)
    # (col j, row r, B, d_i, d_m) -> (B, r, d_i, j, d_m) -> (B, Kd, Kd)
    return jnp.moveaxis(C, 2, 0).transpose(0, 2, 3, 1, 4).reshape(
        bsz, K * d, K * d
    )


def _tail_mat_to_blocks(M, K, d):
    """dense (B, K*d, K*d) -> blocks (K_col, K_row, B, d, d)."""
    bsz = M.shape[0]
    # index [b, r, i, j, m] -> out[j, r, b, i, m]
    return M.reshape(bsz, K, d, K, d).transpose(3, 1, 0, 2, 4)


def _tail_assemble_C(sched: NumericSchedule, ata_flat, lflat):
    """Per-tail-column blocks C = A - external updates, (K, K, B, d, d)."""
    col_a = ata_flat[sched.tail_a_src]  # (K, K, B, d, d)
    col_a = jnp.where(
        sched.tail_a_tr[:, :, None, None, None],
        jnp.swapaxes(col_a, -1, -2),
        col_a,
    )
    ks = lflat[sched.tail_upd_slots]  # (K, ue, K, B, d, d)
    kj = lflat[sched.tail_upd_jk]  # (K, ue, B, d, d)
    kj = jnp.where(
        sched.tail_upd_valid[:, :, None, None, None], kj, 0.0
    )
    upd = jnp.einsum("curbik,cubjk->crbij", ks, kj)
    return col_a - upd


def _tail_dense_eliminate(sched: NumericSchedule, ata_flat, lflat):
    """Factor the trailing dense supernode with ONE batched POTRF and
    scatter the blocks back into Lflat (so all substitution paths read a
    uniform layout)."""
    K = sched.tail_k
    d = ata_flat.shape[-1]
    C = _tail_assemble_C(sched, ata_flat, lflat)
    # symmetrize: strict-lower + its transpose + symmetrized diagonal
    strict = sched.tail_valid & ~np.eye(K, dtype=bool)
    Tl = _tail_dense_blocks_to_mat(C, strict, K, d)
    diag = 0.5 * (
        C[np.arange(K), np.arange(K)]
        + jnp.swapaxes(C[np.arange(K), np.arange(K)], -1, -2)
    )  # (K, B, d, d)
    bsz = C.shape[2]
    D = jnp.zeros((bsz, K, d, K, d), dtype=C.dtype)
    # advanced indices split by slices land in FRONT axes: values (K, B, d, d)
    D = D.at[:, np.arange(K), :, np.arange(K), :].set(diag).reshape(
        bsz, K * d, K * d
    )
    T = Tl + jnp.swapaxes(Tl, -1, -2) + D
    Lt = jnp.linalg.cholesky(T)
    blocks = _tail_mat_to_blocks(Lt, K, d)
    blocks = jnp.where(
        sched.tail_valid[:, :, None, None, None], blocks, 0.0
    )
    return lflat.at[sched.tail_col_slots].set(blocks)


def _tail_dense_L(sched: NumericSchedule, lflat):
    """Reconstruct the dense (B, K*d, K*d) tail factor from Lflat blocks."""
    K = sched.tail_k
    d = lflat.shape[-1]
    blocks = lflat[sched.tail_col_slots]  # (K, K, B, d, d)
    return _tail_dense_blocks_to_mat(blocks, sched.tail_valid, K, d)


def _tail_fwd_solve(sched: NumericSchedule, lflat, y, b_perm):
    """Fill y for tail columns: dense lower solve of the supernode after
    subtracting external head contributions."""
    K = sched.tail_k
    d = b_perm.shape[-1]
    nh = sched.n_head
    ljk = lflat[sched.tail_upd_jk]  # (K, ue, B, d, d)
    yk = y[sched.tail_upd_k]  # (K, ue, B, d)
    yk = jnp.where(sched.tail_upd_valid[:, :, None, None], yk, 0.0)
    acc = b_perm[nh:] - jnp.einsum("kubij,kubj->kbi", ljk, yk)  # (K, B, d)
    bsz = acc.shape[1]
    rhs = jnp.moveaxis(acc, 0, 1).reshape(bsz, K * d)
    Ld = _tail_dense_L(sched, lflat)
    yt = jsl.solve_triangular(Ld, rhs[..., None], lower=True)[..., 0]
    yt_blocks = jnp.moveaxis(yt.reshape(bsz, K, d), 1, 0)
    return y.at[nh:].set(yt_blocks)


def _tail_bwd_solve(sched: NumericSchedule, lflat, y):
    """x for tail columns: dense upper solve L^T x = y_tail (the tail is
    eliminated last, so no rows below contribute)."""
    K = sched.tail_k
    d = y.shape[-1]
    nh = sched.n_head
    bsz = y.shape[1]
    rhs = jnp.moveaxis(y[nh:], 0, 1).reshape(bsz, K * d)
    Ld = _tail_dense_L(sched, lflat)
    xt = jsl.solve_triangular(
        jnp.swapaxes(Ld, -1, -2), rhs[..., None], lower=False
    )[..., 0]
    return jnp.moveaxis(xt.reshape(bsz, K, d), 1, 0)


def factorize(sched: NumericSchedule, ata_flat):
    """ata_flat (n_slots, B, d, d) -> Lflat (nnz_l+1, B, d, d)."""
    if sched.use_levels:
        if _use_runs(sched):
            lflat = _factorize_level_runs(sched, ata_flat)
        elif _pallas_level_ok(sched, ata_flat):
            from .. import config as _config

            lflat = _factorize_levels_pallas(
                sched, ata_flat, interpret=_config._PALLAS_INTERPRET
            )
        else:
            lflat = _factorize_levels(sched, ata_flat)
    else:
        lflat = _factorize_scan(sched, ata_flat)
    if sched.tail_k:
        lflat = _tail_dense_eliminate(sched, ata_flat, lflat)
    return lflat


def _pallas_level_ok(sched: NumericSchedule, ata_flat) -> bool:
    from .. import config as _config

    d = ata_flat.shape[-1]
    if not _config.pallas_enabled(ata_flat.dtype) or d > SMALL_DIM_MAX:
        return False
    if _config._PALLAS_INTERPRET:
        # interpret-mode solves would run every grid program in Python;
        # the kernels have their own direct interpret parity tests
        return False
    from .pallas_factorize import level_fits

    bsz = ata_flat.shape[1]
    return all(
        level_fits(d, t["a_src"].shape[1], t["jk_slots"].shape[1], bsz)
        for t in sched.level_tables
    )


def _factorize_levels_pallas(sched: NumericSchedule, ata_flat,
                             interpret: bool = False):
    """Level sweeps with the arithmetic of each level fused into one Mosaic
    kernel (pallas_factorize.level_eliminate_soa); factor kept in SoA layout
    (nnz_l+1, d*d, B) across levels, converted at the boundaries."""
    from . import pallas_factorize as pf

    sym = sched.sym
    bsz = ata_flat.shape[1]
    d = ata_flat.shape[-1]
    dd = d * d
    dtype = ata_flat.dtype
    # block transpose in SoA = static row permutation of the d*d axis
    perm_t = np.asarray([j * d + i for i in range(d) for j in range(d)])

    ata_soa = pf.aos_to_soa(ata_flat)  # (n_slots, dd, B)
    lflat = jnp.zeros((sym.nnz_l + 1, dd, bsz), dtype=dtype)

    for t in sched.level_tables:
        col_a = ata_soa[t["a_src"]]  # (C, rl, dd, B)
        col_a = jnp.where(
            t["a_tr"][:, :, None, None], col_a[:, :, perm_t, :], col_a
        )
        ks = lflat[t["upd_slots"]]  # (C, ul, rl, dd, B)
        kj = lflat[t["jk_slots"]]  # (C, ul, dd, B)
        newcol = pf.level_eliminate_soa(col_a, ks, kj, d, interpret=interpret)
        newcol = jnp.where(t["valid"][:, :, None, None], newcol, 0.0)
        lflat = lflat.at[t["col_slots"]].set(newcol)

    return pf.soa_to_aos(lflat, d)


def _factorize_levels(sched: NumericSchedule, ata_flat):
    """Level-sweep elimination: one batched POTRF/TRSM/GEMM group per etree
    level; columns within a level are independent by construction."""
    sym = sched.sym
    bsz = ata_flat.shape[1]
    d = ata_flat.shape[-1]
    dtype = ata_flat.dtype
    lflat = jnp.zeros((sym.nnz_l + 1, bsz, d, d), dtype=dtype)

    for t in sched.level_tables:
        col_a = ata_flat[t["a_src"]]  # (C, rl, B, d, d)
        col_a = jnp.where(
            t["a_tr"][:, :, None, None, None], jnp.swapaxes(col_a, -1, -2), col_a
        )
        ks = lflat[t["upd_slots"]]  # (C, ul, rl, B, d, d)
        kj = lflat[t["jk_slots"]]  # (C, ul, B, d, d)
        upd = jnp.einsum("curbik,cubjk->crbij", ks, kj)
        c = col_a - upd
        dblk = 0.5 * (c[:, 0] + jnp.swapaxes(c[:, 0], -1, -2))
        ld = _chol(dblk, d)  # (C, B, d, d)
        rest = _col_rt_solve(ld, c[:, 1:], d)
        newcol = jnp.concatenate([ld[:, None], rest], axis=1)
        newcol = jnp.where(t["valid"][:, :, None, None, None], newcol, 0.0)
        lflat = lflat.at[t["col_slots"]].set(newcol)
    return lflat


_RUN_FACT_KEYS = ("a_src", "a_tr", "valid", "col_slots", "upd_slots",
                  "jk_slots")
_RUN_FWD_KEYS = ("jk_slots", "upd_k", "upd_valid", "diag_slots", "cols")
_RUN_BWD_KEYS = ("col_slots", "row_ids", "row_valid", "cols")


def _run_xs(run, keys):
    return tuple(jnp.asarray(run[k]) for k in keys)


def _pallas_run_ok(sched: NumericSchedule, dtype, bsz: int) -> bool:
    from .. import config as _config

    d = sched.pattern.d
    if not _config.pallas_enabled(dtype) or d > SMALL_DIM_MAX:
        return False
    if _config._PALLAS_INTERPRET:
        return False
    from .pallas_factorize import level_fits

    return all(
        level_fits(d, r["R"], r["U"], bsz) for r in sched.level_runs
    )


def _factorize_level_runs(sched: NumericSchedule, ata_flat):
    """Level-sweep elimination with one lax.scan per run of consecutive
    levels (same math as _factorize_levels; padded columns write zeros to
    the slot-0 sentinel). Optionally fuses each scanned level's arithmetic
    into the per-level Mosaic kernel."""
    sym = sched.sym
    bsz = ata_flat.shape[1]
    d = ata_flat.shape[-1]
    dtype = ata_flat.dtype
    pallas = _pallas_run_ok(sched, dtype, bsz)
    if pallas:
        from . import pallas_factorize as pf
        from .. import config as _config

        perm_t = np.asarray([j * d + i for i in range(d) for j in range(d)])
        ata_soa = pf.aos_to_soa(ata_flat)
        lflat = jnp.zeros((sym.nnz_l + 1, d * d, bsz), dtype=dtype)

        def body(lflat, x):
            a_ids, a_tr, valid, c_slots, upd_ids, jk_ids = x
            col_a = ata_soa[a_ids]  # (C, R, dd, B)
            col_a = jnp.where(
                a_tr[:, :, None, None], col_a[:, :, perm_t, :], col_a
            )
            ks = lflat[upd_ids]  # (C, U, R, dd, B)
            kj = lflat[jk_ids]  # (C, U, dd, B)
            newcol = pf.level_eliminate_soa(
                col_a, ks, kj, d, interpret=_config._PALLAS_INTERPRET
            )
            newcol = jnp.where(valid[:, :, None, None], newcol, 0.0)
            return lflat.at[c_slots].set(newcol), None

        for run in sched.level_runs:
            lflat, _ = jax.lax.scan(body, lflat, _run_xs(run, _RUN_FACT_KEYS))
        return pf.soa_to_aos(lflat, d)

    lflat = jnp.zeros((sym.nnz_l + 1, bsz, d, d), dtype=dtype)

    def body(lflat, x):
        a_ids, a_tr, valid, c_slots, upd_ids, jk_ids = x
        col_a = ata_flat[a_ids]  # (C, R, B, d, d)
        col_a = jnp.where(
            a_tr[:, :, None, None, None], jnp.swapaxes(col_a, -1, -2), col_a
        )
        ks = lflat[upd_ids]
        kj = lflat[jk_ids]
        upd = jnp.einsum("curbik,cubjk->crbij", ks, kj)
        c = col_a - upd
        dblk = 0.5 * (c[:, 0] + jnp.swapaxes(c[:, 0], -1, -2))
        ld = _chol(dblk, d)
        rest = _col_rt_solve(ld, c[:, 1:], d)
        newcol = jnp.concatenate([ld[:, None], rest], axis=1)
        newcol = jnp.where(valid[:, :, None, None, None], newcol, 0.0)
        return lflat.at[c_slots].set(newcol), None

    for run in sched.level_runs:
        lflat, _ = jax.lax.scan(body, lflat, _run_xs(run, _RUN_FACT_KEYS))
    return lflat


def _solve_level_runs(sched: NumericSchedule, lflat, atb):
    """Both substitution passes as per-run scans. Vectors carry one extra
    sentinel row (index n) that padded columns write into; it is dropped
    before the tail interop and the final unpermute."""
    n = sched.sym.n
    d = atb.shape[-1]
    bsz = atb.shape[1]
    b_perm = atb[sched.perm]
    b_ext = jnp.concatenate(
        [b_perm, jnp.zeros((1, bsz, d), atb.dtype)], axis=0
    )
    pallas = _pallas_run_ok(sched, lflat.dtype, bsz)
    if pallas:
        from . import pallas_factorize as pf
        from .. import config as _config

        interp = _config._PALLAS_INTERPRET
        lsoa = pf.aos_to_soa(lflat)
        b_soa = jnp.moveaxis(b_ext, 1, -1)  # (n+1, d, B)
        y = jnp.zeros_like(b_soa)

        def fwd_body(y, x):
            jk_ids, k_ids, kvalid, dslots, cols = x
            ljk = lsoa[jk_ids]  # (C, U, dd, B)
            yk = y[k_ids]  # (C, U, d, B)
            yk = jnp.where(kvalid[:, :, None, None], yk, 0.0)
            yj = pf.fwd_sub_level(
                ljk, yk, b_soa[cols], lsoa[dslots], d, interpret=interp
            )
            return y.at[cols].set(yj), None

        for run in sched.level_runs:
            y, _ = jax.lax.scan(fwd_body, y, _run_xs(run, _RUN_FWD_KEYS))

        x = jnp.zeros_like(y)
        if sched.tail_k:
            y_aos = _tail_fwd_solve(
                sched, lflat, jnp.moveaxis(y[:n], -1, 1), b_perm
            )
            y = y.at[:n].set(jnp.moveaxis(y_aos, 1, -1))
            xt = _tail_bwd_solve(sched, lflat, y_aos)
            x = x.at[sched.n_head : n].set(jnp.moveaxis(xt, 1, -1))

        def bwd_body(x, t):
            c_slots, row_ids, row_valid, cols = t
            lcol = lsoa[c_slots]  # (C, R, dd, B)
            xr = x[row_ids]  # (C, R, d, B)
            below = row_valid & (jnp.arange(row_valid.shape[1])[None, :] > 0)
            xr = jnp.where(below[:, :, None, None], xr, 0.0)
            xj = pf.bwd_sub_level(lcol, xr, y[cols], d, interpret=interp)
            return x.at[cols].set(xj), None

        for run in reversed(sched.level_runs):
            x, _ = jax.lax.scan(
                bwd_body, x, _run_xs(run, _RUN_BWD_KEYS), reverse=True
            )
        return jnp.moveaxis(x[:n], -1, 1)[sched.iperm]

    y = jnp.zeros_like(b_ext)

    def fwd_body(y, x):
        jk_ids, k_ids, kvalid, dslots, cols = x
        ljk = lflat[jk_ids]  # (C, U, B, d, d)
        yk = y[k_ids]  # (C, U, B, d)
        yk = jnp.where(kvalid[:, :, None, None], yk, 0.0)
        acc = b_ext[cols] - jnp.einsum("cubij,cubj->cbi", ljk, yk)
        yj = _fwd_sub(lflat[dslots], acc, d)
        return y.at[cols].set(yj), None

    for run in sched.level_runs:
        y, _ = jax.lax.scan(fwd_body, y, _run_xs(run, _RUN_FWD_KEYS))

    x = jnp.zeros_like(y)
    if sched.tail_k:
        y_real = _tail_fwd_solve(sched, lflat, y[:n], b_perm)
        y = y.at[:n].set(y_real)
        x = x.at[sched.n_head : n].set(
            _tail_bwd_solve(sched, lflat, y_real)
        )

    def bwd_body(x, t):
        c_slots, row_ids, row_valid, cols = t
        lcol = lflat[c_slots]  # (C, R, B, d, d)
        xr = x[row_ids]
        below = row_valid & (jnp.arange(row_valid.shape[1])[None, :] > 0)
        xr = jnp.where(below[:, :, None, None], xr, 0.0)
        acc = y[cols] - jnp.einsum("crbij,crbi->cbj", lcol, xr)
        xj = _bwd_sub(jnp.swapaxes(lcol[:, 0], -1, -2), acc, d)
        return x.at[cols].set(xj), None

    for run in reversed(sched.level_runs):
        x, _ = jax.lax.scan(
            bwd_body, x, _run_xs(run, _RUN_BWD_KEYS), reverse=True
        )
    return x[:n][sched.iperm]


def _factorize_scan(sched: NumericSchedule, ata_flat):
    sym = sched.sym
    bsz = ata_flat.shape[1]
    d = ata_flat.shape[-1]
    dtype = ata_flat.dtype
    lflat0 = jnp.zeros((sym.nnz_l + 1, bsz, d, d), dtype=dtype)

    xs = (
        jnp.asarray(sched.a_src),
        jnp.asarray(sched.a_tr),
        jnp.asarray(sched.upd_slots),
        jnp.asarray(sched.upd_jk_slots),
        jnp.asarray(sched.col_slots),
        jnp.asarray(sched.valid),
    )

    def body(lflat, x):
        a_ids, a_tr, upd_ids, jk_ids, c_slots, valid = x
        col_a = ata_flat[a_ids]  # (rmax, B, d, d)
        col_a = jnp.where(a_tr[:, None, None, None], jnp.swapaxes(col_a, -1, -2), col_a)
        ks = lflat[upd_ids]  # (umax, rmax, B, d, d)
        kj = lflat[jk_ids]  # (umax, B, d, d)
        upd = jnp.einsum("urbik,ubjk->rbij", ks, kj)
        c = col_a - upd
        # symmetrize: cholesky reads the lower triangle only; the symmetric
        # read makes the custom-VJP diag cotangent exact
        dblk = 0.5 * (c[0] + jnp.swapaxes(c[0], -1, -2))
        ld = _chol(dblk, d)  # (B, d, d)
        rest = _col_rt_solve(ld, c[1:], d)
        newcol = jnp.concatenate([ld[None], rest], axis=0)
        newcol = jnp.where(valid[:, None, None, None], newcol, 0.0)
        lflat = lflat.at[c_slots].set(newcol)
        return lflat, None

    lflat, _ = jax.lax.scan(body, lflat0, xs)
    return lflat


def solve_with_factor(sched: NumericSchedule, lflat, atb):
    """Solve H x = atb given L. atb (n, B, d) original var order -> x same."""
    if sched.use_levels:
        if _use_runs(sched):
            return _solve_level_runs(sched, lflat, atb)
        if _pallas_level_ok(sched, lflat):
            from .. import config as _config

            return _solve_levels_pallas(
                sched, lflat, atb, interpret=_config._PALLAS_INTERPRET
            )
        return _solve_levels(sched, lflat, atb)
    return _solve_scan(sched, lflat, atb)


def _solve_levels_pallas(sched: NumericSchedule, lflat, atb,
                         interpret: bool = False):
    """Both substitution passes with each level's arithmetic fused into one
    Mosaic kernel (pallas_factorize.fwd_sub_level / bwd_sub_level); vectors
    ride SoA (n, d, B) across levels."""
    from . import pallas_factorize as pf

    d = atb.shape[-1]
    b_perm = atb[sched.perm]  # (n, B, d)
    b_soa = jnp.moveaxis(b_perm, 1, -1)  # (n, d, B)
    lsoa = pf.aos_to_soa(lflat)  # (nnz_l+1, dd, B)

    y = jnp.zeros_like(b_soa)
    for t in sched.level_tables:
        ljk = lsoa[t["jk_slots"]]  # (C, ul, dd, B)
        yk = y[t["upd_k"]]  # (C, ul, d, B)
        yk = jnp.where(t["upd_valid"][:, :, None, None], yk, 0.0)
        yj = pf.fwd_sub_level(
            ljk, yk, b_soa[t["cols"]], lsoa[t["diag_slots"]], d,
            interpret=interpret,
        )
        y = y.at[t["cols"]].set(yj)

    x = jnp.zeros_like(y)
    if sched.tail_k:
        # dense supernode: fwd finish + bwd start, in AoS (lflat is AoS here)
        y_aos = _tail_fwd_solve(
            sched, lflat, jnp.moveaxis(y, -1, 1), b_perm
        )
        y = jnp.moveaxis(y_aos, 1, -1)
        xt = _tail_bwd_solve(sched, lflat, y_aos)  # (K, B, d)
        x = x.at[sched.n_head :].set(jnp.moveaxis(xt, 1, -1))
    for t in reversed(sched.level_tables):
        lcol = lsoa[t["col_slots"]]  # (C, rl, dd, B)
        xr = x[t["row_ids"]]  # (C, rl, d, B)
        rl = t["row_valid"].shape[1]
        below = t["row_valid"] & (np.arange(rl)[None, :] > 0)
        xr = jnp.where(below[:, :, None, None], xr, 0.0)
        xj = pf.bwd_sub_level(lcol, xr, y[t["cols"]], d, interpret=interpret)
        x = x.at[t["cols"]].set(xj)

    return jnp.moveaxis(x, -1, 1)[sched.iperm]


def _bwd_levels(sched: NumericSchedule, lflat, y):
    """L^T x = y in internal (permuted) order; per-level sweeps."""
    x = jnp.zeros_like(y)
    if sched.tail_k:
        x = x.at[sched.n_head :].set(_tail_bwd_solve(sched, lflat, y))
    for t in reversed(sched.level_tables):
        lcol = lflat[t["col_slots"]]  # (C, rl, B, d, d)
        xr = x[t["row_ids"]]  # (C, rl, B, d)
        rl = t["row_valid"].shape[1]
        below = t["row_valid"] & (np.arange(rl)[None, :] > 0)
        xr = jnp.where(below[:, :, None, None], xr, 0.0)
        acc = y[t["cols"]] - jnp.einsum("crbij,crbi->cbj", lcol, xr)
        xj = _bwd_sub(jnp.swapaxes(lcol[:, 0], -1, -2), acc, acc.shape[-1])
        x = x.at[t["cols"]].set(xj)
    return x


def _solve_levels(sched: NumericSchedule, lflat, atb):
    sym = sched.sym
    b_perm = atb[sched.perm]  # (n, B, d)

    y = jnp.zeros_like(b_perm)
    for t in sched.level_tables:
        ljk = lflat[t["jk_slots"]]  # (C, ul, B, d, d)
        yk = y[t["upd_k"]]  # (C, ul, B, d)
        yk = jnp.where(t["upd_valid"][:, :, None, None], yk, 0.0)
        acc = b_perm[t["cols"]] - jnp.einsum("cubij,cubj->cbi", ljk, yk)
        yj = _fwd_sub(lflat[t["diag_slots"]], acc, acc.shape[-1])
        y = y.at[t["cols"]].set(yj)
    if sched.tail_k:
        y = _tail_fwd_solve(sched, lflat, y, b_perm)

    return _bwd_levels(sched, lflat, y)[sched.iperm]


def _solve_scan(sched: NumericSchedule, lflat, atb):
    b_perm = atb[sched.perm]  # (n, B, d)

    # forward: L y = b (head columns sequentially, then the dense tail)
    y0 = jnp.zeros_like(b_perm)
    fwd_xs = (
        jnp.arange(sched.n_head, dtype=jnp.int32),
        jnp.asarray(sched.upd_jk_slots),
        jnp.asarray(sched.upd_k),
        jnp.asarray(sched.upd_valid),
        jnp.asarray(sched.diag_slots),
    )

    def fwd_body(y, x):
        j, jk_ids, k_ids, kvalid, dslot = x
        ljk = lflat[jk_ids]  # (umax, B, d, d)
        yk = y[k_ids]  # (umax, B, d)
        yk = jnp.where(kvalid[:, None, None], yk, 0.0)
        acc = b_perm[j] - jnp.einsum("ubij,ubj->bi", ljk, yk)
        yj = _fwd_sub(lflat[dslot], acc, acc.shape[-1])
        return y.at[j].set(yj), None

    y, _ = jax.lax.scan(fwd_body, y0, fwd_xs)
    if sched.tail_k:
        y = _tail_fwd_solve(sched, lflat, y, b_perm)

    return _bwd_scan(sched, lflat, y)[sched.iperm]


def _bwd_scan(sched: NumericSchedule, lflat, y):
    """L^T x = y in internal (permuted) order; dense tail first, then a
    sequential scan over head columns."""
    x0 = jnp.zeros_like(y)
    if sched.tail_k:
        x0 = x0.at[sched.n_head :].set(_tail_bwd_solve(sched, lflat, y))
    bwd_xs = (
        jnp.arange(sched.n_head, dtype=jnp.int32)[::-1],
        jnp.asarray(sched.col_slots[::-1]),
        jnp.asarray(sched.col_row_ids[::-1]),
        jnp.asarray(sched.row_valid[::-1]),
    )

    def bwd_body(xv, t):
        j, slots, rows, rvalid = t
        lcol = lflat[slots]  # (rmax, B, d, d); [0] is diag
        xr = xv[rows]  # (rmax, B, d)
        below_mask = rvalid & (jnp.arange(rvalid.shape[0]) > 0)
        xr = jnp.where(below_mask[:, None, None], xr, 0.0)
        acc = y[j] - jnp.einsum("rbij,rbi->bj", lcol, xr)
        xj = _bwd_sub(jnp.swapaxes(lcol[0], -1, -2), acc, acc.shape[-1])
        return xv.at[j].set(xj), None

    x, _ = jax.lax.scan(bwd_body, x0, bwd_xs)
    return x


def _bwd_runs(sched: NumericSchedule, lflat, y):
    """L^T x = y in internal order via per-run scans (XLA path); y (n, B, d).
    Dense tail first, then head runs in reverse."""
    n = sched.sym.n
    d = y.shape[-1]
    bsz = y.shape[1]
    y_ext = jnp.concatenate([y, jnp.zeros((1, bsz, d), y.dtype)], axis=0)
    x = jnp.zeros_like(y_ext)
    if sched.tail_k:
        x = x.at[sched.n_head : n].set(_tail_bwd_solve(sched, lflat, y))

    def bwd_body(x, t):
        c_slots, row_ids, row_valid, cols = t
        lcol = lflat[c_slots]
        xr = x[row_ids]
        below = row_valid & (jnp.arange(row_valid.shape[1])[None, :] > 0)
        xr = jnp.where(below[:, :, None, None], xr, 0.0)
        acc = y_ext[cols] - jnp.einsum("crbij,crbi->cbj", lcol, xr)
        xj = _bwd_sub(jnp.swapaxes(lcol[:, 0], -1, -2), acc, d)
        return x.at[cols].set(xj), None

    for run in reversed(sched.level_runs):
        x, _ = jax.lax.scan(
            bwd_body, x, _run_xs(run, _RUN_BWD_KEYS), reverse=True
        )
    return x[:n]


def sample_with_factor(sched: NumericSchedule, lflat, y):
    """y (n, B, d) iid N(0,1) -> x = P^T L^{-T} y with cov H^{-1}, original
    variable order. Backward substitution only — posterior sampling (LEO,
    reference theseus_layer.py:99-135) at sparse cost: H = P^T L L^T P, so
    cov(P^T L^{-T} y) = P^T (L L^T)^{-1} P = H^{-1}."""
    if sched.use_levels and _use_runs(sched):
        x = _bwd_runs(sched, lflat, y)
    elif sched.use_levels:
        x = _bwd_levels(sched, lflat, y)
    else:
        x = _bwd_scan(sched, lflat, y)
    return x[sched.iperm]


def _use_whole(sched: NumericSchedule, dtype, bsz: int) -> bool:
    """Gate for the whole-sweep kernels (pallas_whole.py): one Mosaic
    program per sweep with the factor in HBM. Default OFF
    (config.PALLAS_WHOLE) — A/B-measured slower than the per-level kernels
    at every tested shape; see config.py for the numbers. Requires no dense
    tail and the usual Pallas preconditions."""
    from .. import config as _config

    if not _config.PALLAS_WHOLE:
        return False
    if sched.tail_k or sched.n_head == 0:
        return False
    d = sched.pattern.d
    if not _config.pallas_enabled(dtype) or d > SMALL_DIM_MAX:
        return False
    if _config._PALLAS_INTERPRET:
        return False
    from .pallas_whole import whole_fits

    return whole_fits(sched, d, bsz)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def sparse_block_solve(sched: NumericSchedule, ata_flat, atb):
    """x = H^{-1} atb with H the assembled block matrix. Differentiable wrt
    both inputs via factorization reuse."""
    return _solve_fwd(sched, ata_flat, atb)[0]


def _refine_with_factor(sched, lflat, ata_flat, b, x0):
    """Apply config.REFINE_STEPS mixed-precision IR sweeps reusing the
    factor (sparse/refine.py; reference f64-solve contract,
    baspacho_sparse_autograd.py:41)."""
    from .. import config as _config
    from .refine import block_matvec, hp_dtype, refine, refine_active

    steps = _config.REFINE_STEPS
    if not refine_active(b.dtype):
        return x0
    tables = sched.matvec_tables()
    hp = hp_dtype(b.dtype)
    if lflat.ndim == 3:  # SoA factor from the whole-kernel path
        from .pallas_whole import solve_whole

        inner = lambda r: solve_whole(sched, lflat, r)  # noqa: E731
    else:
        inner = lambda r: solve_with_factor(sched, lflat, r)  # noqa: E731
    return refine(
        inner, lambda xv: block_matvec(tables, ata_flat, xv, hp), b, x0, steps
    )


def _solve_fwd(sched, ata_flat, atb):
    if _use_whole(sched, ata_flat.dtype, ata_flat.shape[1]):
        from .pallas_whole import factorize_whole, solve_whole

        lsoa = factorize_whole(sched, ata_flat)
        x = solve_whole(sched, lsoa, atb)
        x = _refine_with_factor(sched, lsoa, ata_flat, atb, x)
        return x, (lsoa, ata_flat, x)
    lflat = factorize(sched, ata_flat)
    x = solve_with_factor(sched, lflat, atb)
    x = _refine_with_factor(sched, lflat, ata_flat, atb, x)
    return x, (lflat, ata_flat, x)


def _solve_bwd(sched, res, g):
    lflat, ata_flat, x = res
    if lflat.ndim == 3:  # SoA residual from the whole-kernel path
        from .pallas_whole import solve_whole

        h = solve_whole(sched, lflat, g)
    else:
        h = solve_with_factor(sched, lflat, g)  # H symmetric
    h = _refine_with_factor(sched, lflat, ata_flat, g, h)
    d_atb = h

    pattern = sched.pattern
    n_slots = int(max(pattern.pair_slot.values())) + 1
    # gradients on stored blocks: canonical (i <= j):
    #   off-diag: -(h_i x_j^T + x_i h_j^T); diag: -h_i x_i^T
    items = sorted(pattern.pair_slot.items(), key=lambda kv: kv[1])
    ii = np.array([k[0] for k, _ in items])
    jj = np.array([k[1] for k, _ in items])
    slots = np.array([s for _, s in items])
    is_diag = ii == jj

    hi, xj = h[ii], x[jj]
    xi, hj = x[ii], h[jj]
    grad_off = -(jnp.einsum("nbi,nbj->nbij", hi, xj) + jnp.einsum("nbi,nbj->nbij", xi, hj))
    # diag blocks are read symmetrized in the forward
    grad_diag = -0.5 * (
        jnp.einsum("nbi,nbj->nbij", hi, xj) + jnp.einsum("nbi,nbj->nbij", xi, hj)
    )
    grads = jnp.where(jnp.asarray(is_diag)[:, None, None, None], grad_diag, grad_off)

    d_ata = jnp.zeros(
        (n_slots, h.shape[1], pattern.d, pattern.d), dtype=h.dtype
    )
    d_ata = d_ata.at[jnp.asarray(slots)].set(grads)
    return d_ata, d_atb


sparse_block_solve.defvjp(_solve_fwd, _solve_bwd)
