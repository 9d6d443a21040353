"""Whole-sweep Pallas kernels: factorization and substitution as ONE Mosaic
program each.

The per-level kernels (pallas_factorize.py) still pay ~6 XLA ops of
gather/scatter/where per etree level plus a kernel launch, ~3 sweeps per LM
iteration; at the flagship shape the whole iteration is op-latency-bound
(0.07% MFU), so those ~300 dispatches ARE the cost. This module collapses
each sweep to a single program:

- grid = (n_head_columns,) in elimination order — TPU grid steps run
  sequentially, which IS the left-looking dependency order (column j only
  reads columns k < j).
- the factor lives in HBM (`pl.ANY` memory space); per-column operands move
  by explicit in-kernel DMA. The key structural fact (verified in
  structure.py's column-major slot allocation): the blocks of source column
  k needed by column j — L[j,k] and L[rows_j∩rows_k, k] — are a CONTIGUOUS
  TAIL of column k's slot run starting at slot(L[j,k]). So each left-looking
  update is ONE small DMA, and each column write is ONE contiguous DMA.
- substitution sweeps keep the solution vector VMEM-resident (n·d·B floats)
  and DMA one contiguous column run per step, double-buffered (the factor is
  read-only there, so prefetch of column c+1 overlaps column c's compute).
- the write-back DMA of column j is waited at the top of step j+1, so it
  overlaps the next column's operand DMAs; reads are safe because a column
  in the same level never reads its neighbours and later levels run later.

This is the TPU-native replacement for BaSpaCho's numeric sweep loop
(reference extlib/baspacho_solver.h:29-68 factor/solve); correctness is
pinned against the pure-JAX paths in tests/optim/test_pallas_whole.py and on
hardware by scripts/tpu_pallas_parity.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _lanes(bsz: int) -> int:
    """DMA slices must be aligned to the 128-lane tiling: the batch (lane)
    dim of every DMA-touched buffer is padded up to a multiple of 128."""
    return ((bsz + 127) // 128) * 128


def _sublanes(dd: int) -> int:
    """DMA-touched buffers must also align the second-minor (sublane) dim
    to the 8-row f32 tiling: a (·, 36, 128) HBM buffer crashes the DMA
    engine at runtime (probed: INTERNAL error for dd=36, clean for dd=32/40).
    All dd-sized dims of DMA endpoints are padded up to a multiple of 8."""
    return ((dd + 7) // 8) * 8


class WholeTables:
    """Static per-column index tables for the whole-sweep kernels.

    Layout facts used (asserted here at build time):
    - col_slots[j] is a contiguous ascending run (column-major allocation)
    - for every update (j, u) with source column k: the slots
      {slot(L[j,k])} ∪ {upd_slots[j,u,t] != 0} form exactly the contiguous
      tail [slot(L[j,k]), end of column k)
    """

    def __init__(self, sched):
        sym = sched.sym
        nh = sched.n_head
        rmax = sched.a_src.shape[1]
        umax = sched.upd_slots.shape[1]

        cstart = np.zeros(nh, np.int32)
        clen = np.zeros(nh, np.int32)
        col_end = {}
        for j in range(nh):
            slots = [int(s) for s in sched.col_slots[j] if s != 0]
            assert slots == list(range(slots[0], slots[0] + len(slots)))
            cstart[j] = slots[0]
            clen[j] = len(slots)
            col_end[slots[0]] = slots[0] + len(slots)

        ucount = sched.upd_valid.sum(axis=1).astype(np.int32)
        # valid u entries are packed at the front (structure.py builds them
        # from packed upd_lists)
        assert all(
            sched.upd_valid[j, : ucount[j]].all() for j in range(nh)
        )

        usrc = np.asarray(sched.upd_jk_slots[:, :umax], np.int32)
        # tail length per (j, u) and its global max
        tlen = np.zeros((nh, umax), np.int32)
        starts_arr = np.sort(np.asarray(list(col_end.keys())))
        for j in range(nh):
            for u in range(int(ucount[j])):
                jk = int(usrc[j, u])
                # source column start = largest column start <= jk
                si = int(np.searchsorted(starts_arr, jk, side="right")) - 1
                tlen[j, u] = col_end[int(starts_arr[si])] - jk
        tlmax = max(1, int(tlen.max()) if tlen.size else 1)

        # imap[j, u, t]: scratch row (tail position) holding L[row_t, k];
        # row TLMAX of the scratch is a permanent zero pad
        imap = np.full((nh, umax, rmax), tlmax, np.int32)
        imap[:, :, 0] = 0  # diagonal update kj·kjᵀ uses the tail head
        for j in range(nh):
            for u in range(int(ucount[j])):
                jk = int(usrc[j, u])
                for t in range(1, rmax):
                    s = int(sched.upd_slots[j, u, t])
                    if s != 0:
                        p = s - jk
                        assert 0 < p < tlen[j, u]
                        imap[j, u, t] = p

        # push/pull targets for the substitution sweeps: absolute row index
        # in permuted order, padded with nh (the extra pad row of y/x)
        rid = np.where(
            sched.row_valid, sched.col_row_ids, nh
        ).astype(np.int32)

        self.n_head = nh
        self.rmax = rmax
        self.umax = umax
        self.tlmax = tlmax
        self.pad = max(tlmax, rmax)
        self.cstart = cstart
        self.clen = clen
        self.ucount = np.asarray(ucount, np.int32)
        # SMEM is 1 MB and 2D scalar operands pad the trailing dim to full
        # 128 lanes (a (2500, 75) uimap would occupy 1.28 MB). Both update
        # tables are therefore flattened to 1D, and uimap — whose values are
        # tail positions in [0, tlmax], tlmax being single-digit — is packed
        # four bytes per int32: 2500 columns cost 188 KB instead of 1.28 MB.
        assert tlmax < 255
        self.usrc = usrc.reshape(-1)  # (nh*umax,)
        flat = imap.reshape(-1).astype(np.uint32)  # ((j*umax+u)*rmax+t,)
        npad = (-len(flat)) % 4
        flat = np.concatenate([flat, np.zeros(npad, np.uint32)])
        words = (
            flat[0::4] | (flat[1::4] << 8) | (flat[2::4] << 16)
            | (flat[3::4] << 24)
        )
        self.uimap_packed = words.astype(np.int32)
        self.rid = rid  # (nh, rmax); flattened to 1D at call time


def get_tables(sched) -> WholeTables:
    t = getattr(sched, "_whole_tables", None)
    if t is None:
        t = WholeTables(sched)
        sched._whole_tables = t
    return t


# ---------------------------------------------------------------------------
# factorization kernel
# ---------------------------------------------------------------------------


def _fact_kernel(d: int, rmax: int, tlmax: int, n_cols: int, pad: int,
                 nnz_total: int, umax: int):
    dd = d * d
    dd8 = _sublanes(dd)

    def kernel(cstart_ref, ucount_ref, usrc_ref, uimap_ref,
               cola_ref, lout_ref, tail_s, wbuf, zbuf, rsem, wsem):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            # permanent zero pad row for masked update rows
            tail_s[tlmax] = jnp.zeros_like(tail_s[tlmax])
            if dd8 > dd:
                # sublane-pad rows of the write buffer are flushed into
                # every column slot: keep them zero
                wbuf[:, dd:, :] = jnp.zeros_like(wbuf[:, dd:, :])
            # zero the sentinel slot 0 and the overhang pad region so
            # downstream XLA consumers (masked gathers) read zeros
            zbuf[...] = jnp.zeros_like(zbuf)
            z0 = pltpu.make_async_copy(
                zbuf.at[pl.ds(0, 1)], lout_ref.at[pl.ds(0, 1)], wsem
            )
            z0.start()
            z0.wait()
            zp = pltpu.make_async_copy(
                zbuf, lout_ref.at[pl.ds(nnz_total, pad)], wsem
            )
            zp.start()
            zp.wait()

        @pl.when(c > 0)
        def _():
            # previous column's write-back: reconstructing the descriptor
            # (same shape/sem) and waiting is the Mosaic idiom for waiting
            # on a DMA started in an earlier grid step
            pltpu.make_async_copy(
                wbuf, lout_ref.at[pl.ds(cstart_ref[c - 1], rmax)], wsem
            ).wait()

        # accumulator: tuple of dd (rmax, B) tiles seeded from the streamed,
        # pre-transposed AtA gather for this column
        acc = tuple(cola_ref[0, :, ij, :] for ij in range(dd))

        def u_body(u, acc):
            src = usrc_ref[c * umax + u]
            dma = pltpu.make_async_copy(
                lout_ref.at[pl.ds(src, tlmax)],
                tail_s.at[pl.ds(0, tlmax)],
                rsem,
            )
            dma.start()
            dma.wait()
            kj = tail_s[0]  # (dd, B) = L[j, k]

            def imap(t):
                # four byte-packed tail positions per int32 (see WholeTables);
                # mask AFTER the arithmetic shift so the sign-extended top
                # byte still unpacks correctly
                f = (c * umax + u) * rmax + t
                return (uimap_ref[f >> 2] >> ((f & 3) * 8)) & 0xFF

            ks = jnp.stack(
                [tail_s[imap(t)] for t in range(rmax)],
                axis=0,
            )  # (rmax, dd, B), row t = L[row_t, k] (zero pad when absent)
            out = []
            for a in range(d):
                for b in range(d):
                    v = acc[a * d + b]
                    for k2 in range(d):
                        v = v - ks[:, a * d + k2, :] * kj[b * d + k2, :][None, :]
                    out.append(v)
            return tuple(out)

        acc = jax.lax.fori_loop(0, ucount_ref[c], u_body, acc)

        def cv(i, j):  # diag-block entry (B,)
            return acc[i * d + j][0]

        # POTRF on the symmetrized diagonal block
        l = [[None] * d for _ in range(d)]
        inv = [None] * d
        for j in range(d):
            s = cv(j, j)
            for k in range(j):
                s = s - l[j][k] * l[j][k]
            ljj = jnp.sqrt(s)
            l[j][j] = ljj
            inv[j] = 1.0 / ljj
            for i in range(j + 1, d):
                s = 0.5 * (cv(i, j) + cv(j, i))
                for k in range(j):
                    s = s - l[i][k] * l[j][k]
                l[i][j] = s * inv[j]
        zero = jnp.zeros_like(l[0][0])
        for i in range(d):
            for j in range(d):
                wbuf[0, i * d + j, :] = l[i][j] if j <= i else zero

        # TRSM for the sub-diagonal rows: X = C_r L^{-T} (pad rows are zero
        # because AtA pads gather the zero sentinel and update pads hit the
        # zero scratch row)
        if rmax > 1:
            x = [[None] * d for _ in range(d)]
            for i in range(d):
                for j in range(d):
                    s = acc[i * d + j][1:]
                    for k in range(j):
                        s = s - x[i][k] * l[j][k][None, :]
                    x[i][j] = s * inv[j][None, :]
            for i in range(d):
                for j in range(d):
                    wbuf[1:, i * d + j, :] = x[i][j]

        w = pltpu.make_async_copy(
            wbuf, lout_ref.at[pl.ds(cstart_ref[c], rmax)], wsem
        )
        w.start()

        @pl.when(c == n_cols - 1)
        def _():
            w.wait()

    return kernel


@lru_cache(maxsize=None)
def _build_fact_call(d, rmax, tlmax, pad, n_cols, nnz_total, umax, bsz,
                     dtype_name, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    dd = d * d
    dd8 = _sublanes(dd)
    kernel = _fact_kernel(d, rmax, tlmax, n_cols, pad, nnz_total, umax)

    def call(cstart, ucount, usrc, uimap, cola):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_cols,),
            in_specs=[
                pl.BlockSpec(
                    (1, rmax, dd, bsz), lambda c, *_: (c, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((tlmax + 1, dd8, bsz), dtype),
                pltpu.VMEM((rmax, dd8, bsz), dtype),
                pltpu.VMEM((pad, dd8, bsz), dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nnz_total + pad, dd8, bsz), dtype),
            interpret=interpret,
        )(cstart, ucount, usrc, uimap, cola)

    return call


def factorize_whole(sched, ata_flat, interpret: bool = False):
    """ata_flat (n_slots, B, d, d) -> Lsoa (nnz_l+1+pad, dd8, Bpad).

    Head columns only (gate requires tail_k == 0). The returned factor is
    SoA with `pad` trailing scratch slots; slot 0 and the pad are zero.
    Both trailing dims stay DMA-aligned (dd8 = d*d rounded to 8 sublanes,
    Bpad = batch rounded to 128 lanes) — solve_whole consumes it as-is.
    """
    from .pallas_factorize import aos_to_soa

    t = get_tables(sched)
    d = ata_flat.shape[-1]
    bsz = ata_flat.shape[1]
    # DMA slices must be lane-aligned: pad the batch (lane) dim to 128.
    # The factor STAYS padded — solve_whole consumes it as-is.
    bpad = _lanes(bsz)

    ata_soa = aos_to_soa(ata_flat)  # (n_slots, dd, B)
    perm_t = np.asarray([j * d + i for i in range(d) for j in range(d)])
    cola = ata_soa[sched.a_src]  # (nh, rmax, dd, B)
    cola = jnp.where(
        np.asarray(sched.a_tr)[:, :, None, None], cola[:, :, perm_t, :], cola
    )
    if bpad != bsz:
        cola = jnp.pad(cola, ((0, 0), (0, 0), (0, 0), (0, bpad - bsz)))
        # identity diagonal blocks in the lane-pad batch entries: POTRF of
        # the zero matrix is 1/sqrt(0) = NaN, which the overhang write of
        # the last columns would smear into the zero pad slots
        diag_ij = np.asarray([i * d + i for i in range(d)])
        cola = cola.at[:, 0, diag_ij, bsz:].set(1.0)

    call = _build_fact_call(
        d, t.rmax, t.tlmax, t.pad, t.n_head, sched.sym.nnz_l + 1, t.umax,
        bpad, jnp.dtype(ata_flat.dtype).name, interpret,
    )
    return call(
        jnp.asarray(t.cstart), jnp.asarray(t.ucount),
        jnp.asarray(t.usrc), jnp.asarray(t.uimap_packed), cola,
    )


# ---------------------------------------------------------------------------
# substitution kernels (double-buffered column-run DMA; vectors VMEM-resident)
# ---------------------------------------------------------------------------


def _fwd_kernel(d: int, rmax: int, n_cols: int):
    dd = d * d

    def kernel(cstart_ref, rid_ref, lany_ref, b_ref, y_ref, lcol_s, rsem):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c = pl.program_id(0)

        def start(col, slot):
            pltpu.make_async_copy(
                lany_ref.at[pl.ds(cstart_ref[col], rmax)],
                lcol_s.at[slot], rsem.at[slot],
            ).start()

        @pl.when(c == 0)
        def _():
            y_ref[...] = b_ref[...]
            start(0, 0)

        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))
        pltpu.make_async_copy(
            lany_ref.at[pl.ds(cstart_ref[c], rmax)],
            lcol_s.at[slot], rsem.at[slot],
        ).wait()

        @pl.when(c < n_cols - 1)
        def _():
            start(c + 1, jax.lax.rem(c + 1, jnp.asarray(2, c.dtype)))

        # lower solve with the diagonal block
        lc = lcol_s[slot]  # (rmax, dd, B)
        accj = y_ref[c]  # (d, B)
        yv = [None] * d
        for i in range(d):
            s = accj[i]
            for k in range(i):
                s = s - lc[0, i * d + k, :] * yv[k]
            yv[i] = s / lc[0, i * d + i, :]
        for i in range(d):
            y_ref[c, i, :] = yv[i]

        # right-looking push into the rows below (pad row n absorbs invalid)
        for t in range(1, rmax):
            r = rid_ref[c * rmax + t]  # rid arrives 1D (SMEM lane padding)
            for i in range(d):
                s = y_ref[r, i, :]
                for k in range(d):
                    s = s - lc[t, i * d + k, :] * yv[k]
                y_ref[r, i, :] = s

    return kernel


def _bwd_kernel(d: int, rmax: int, n_cols: int):
    dd = d * d

    def kernel(cstart_ref, rid_ref, jcol_ref, lany_ref, y_ref, x_ref,
               lcol_s, rsem):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c = pl.program_id(0)  # tables arrive pre-reversed: c=0 is the LAST column

        def start(idx, slot):
            pltpu.make_async_copy(
                lany_ref.at[pl.ds(cstart_ref[idx], rmax)],
                lcol_s.at[slot], rsem.at[slot],
            ).start()

        @pl.when(c == 0)
        def _():
            x_ref[...] = jnp.zeros_like(x_ref)
            start(0, 0)

        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))
        pltpu.make_async_copy(
            lany_ref.at[pl.ds(cstart_ref[c], rmax)],
            lcol_s.at[slot], rsem.at[slot],
        ).wait()

        @pl.when(c < n_cols - 1)
        def _():
            start(c + 1, jax.lax.rem(c + 1, jnp.asarray(2, c.dtype)))

        lc = lcol_s[slot]
        j = jcol_ref[c]
        acc = [y_ref[j, i, :] for i in range(d)]
        for t in range(1, rmax):
            r = rid_ref[c * rmax + t]  # pad row of x is zero; rid is 1D
            for jv in range(d):
                s = acc[jv]
                for i in range(d):
                    s = s - lc[t, i * d + jv, :] * x_ref[r, i, :]
                acc[jv] = s
        xv = [None] * d
        for jv in reversed(range(d)):
            s = acc[jv]
            for k in range(jv + 1, d):
                s = s - lc[0, k * d + jv, :] * xv[k]
            xv[jv] = s / lc[0, jv * d + jv, :]
        for jv in range(d):
            x_ref[j, jv, :] = xv[jv]

    return kernel


@lru_cache(maxsize=None)
def _build_solve_calls(d, rmax, n_cols, bsz, dtype_name, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    dd8 = _sublanes(d * d)
    fkernel = _fwd_kernel(d, rmax, n_cols)
    bkernel = _bwd_kernel(d, rmax, n_cols)

    common_scratch = [
        pltpu.VMEM((2, rmax, dd8, bsz), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def vec_spec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def fwd(cstart, rid, lsoa, b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_cols,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vec_spec()],
            out_specs=vec_spec(),
            scratch_shapes=list(common_scratch),
        )
        return pl.pallas_call(
            fkernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_cols + 1, d, bsz), dtype),
            interpret=interpret,
        )(cstart, rid, lsoa, b)

    def bwd(cstart, rid, jcol, lsoa, y):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_cols,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vec_spec()],
            out_specs=vec_spec(),
            scratch_shapes=list(common_scratch),
        )
        return pl.pallas_call(
            bkernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_cols + 1, d, bsz), dtype),
            interpret=interpret,
        )(cstart, rid, jcol, lsoa, y)

    return fwd, bwd


def solve_whole(sched, lsoa, atb, interpret: bool = False):
    """H x = atb given the whole-kernel factor. atb (n, B, d) original
    order -> x (n, B, d) original order."""
    t = get_tables(sched)
    d = atb.shape[-1]
    bsz = atb.shape[1]
    nh = t.n_head
    bpad = lsoa.shape[-1]  # factor arrives lane-padded from factorize_whole

    fwd, bwd = _build_solve_calls(
        d, t.rmax, nh, bpad, jnp.dtype(atb.dtype).name, interpret
    )

    b_perm = atb[sched.perm]  # (n, B, d)
    b_soa = jnp.moveaxis(b_perm, 1, -1)  # (n, d, B)
    b_pad = jnp.concatenate(
        [b_soa, jnp.zeros((1, d, bsz), dtype=b_soa.dtype)], axis=0
    )
    if bpad != bsz:
        b_pad = jnp.pad(b_pad, ((0, 0), (0, 0), (0, bpad - bsz)))

    y = fwd(
        jnp.asarray(t.cstart), jnp.asarray(t.rid.reshape(-1)), lsoa, b_pad
    )

    rev = np.arange(nh - 1, -1, -1)
    x = bwd(
        jnp.asarray(t.cstart[rev]), jnp.asarray(t.rid[rev].reshape(-1)),
        jnp.asarray(rev.astype(np.int32)), lsoa, y,
    )
    return jnp.moveaxis(x[:nh, :, :bsz], -1, 1)[sched.iperm]


# VMEM gate: per-column working set only (the factor stays in HBM)
_VMEM_BUDGET = 8 * 1024 * 1024
# SMEM holds the prefetched scalar tables (1 MB total); leave headroom for
# Mosaic's own grid bookkeeping
_SMEM_BUDGET = 800 * 1024
# Below this column count the per-level kernels win: the whole kernel's
# sequential per-column grid amortizes dispatch only when the etree is deep
# (A/B on TPU v5e: 64 poses 0.296 -> 0.381 ms/iter, 256 poses a wash)
WHOLE_MIN_COLS = 192


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def whole_fits(sched, d: int, bsz: int) -> bool:
    t = get_tables(sched)
    if t.n_head < WHOLE_MIN_COLS:
        return False
    lanes = ((bsz + 127) // 128) * 128
    dd_pad = ((d * d + 7) // 8) * 8
    blocks = (
        (t.tlmax + 1)  # tail scratch
        + t.rmax  # write buffer
        + t.pad  # zero buffer
        + 2 * t.rmax  # streamed col_a (double-buffered)
        + 2 * t.rmax  # solve lcol double buffer
    ) * dd_pad * lanes * 4
    # scalar-prefetch tables: 1D operands still lane-pad to 128 entries
    nh = t.n_head
    smem = 4 * (
        2 * _pad128(nh)  # cstart + ucount
        + _pad128(nh * t.umax)  # usrc
        + _pad128(len(t.uimap_packed))  # byte-packed uimap
        + _pad128(nh * t.rmax)  # rid (solve sweeps)
    )
    return blocks <= _VMEM_BUDGET and smem <= _SMEM_BUDGET
