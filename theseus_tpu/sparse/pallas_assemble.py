"""Pallas fused AtA/Atb assembly.

The XLA assembly path (assemble.py) lowers to per-bucket einsums plus
one-hot-matmul segment reductions; at the flagship PGO shape those cost
~4-5 ms of a ~9 ms LM iteration. This kernel fuses the whole bucket into one
Mosaic program: the block accumulators live in VMEM for the entire edge
sweep (grid iterations on TPU run sequentially, so read-modify-write
accumulation is race-free), edges are processed in sublane-sized chunks, and
every J_s^T J_t entry is a (chunk, B)-shaped VPU op with the batch in lanes.
Orientation (canonical lower-triangle storage) is a per-edge scalar select —
no in-tile transposes at all.

Layout: accumulators are 2D (n_slots * SL, B) with SL = d*d rounded up to
the f32 sublane count, so each slot's row range starts at an aligned offset.
Gated by VMEM fit; exact-parity fallback is assemble.py's XLA path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _bucket_kernel(n_pairs, pair_st, n_slots_b, d, m, E, SL, SV):
    """pair_st: static list of (s, t) slot-index pairs for this bucket."""

    def kernel(tgt_ref, tr_ref, ad_ref, gv_ref, *refs):
        import jax.experimental.pallas as pl

        jac_refs = refs[:n_slots_b]
        err_ref = refs[n_slots_b]
        ata_ref = refs[n_slots_b + 1]
        atb_ref = refs[n_slots_b + 2]

        c0 = pl.program_id(0)

        # pallas outputs start uninitialized: zero-seed the VMEM accumulators
        # on the first chunk (they stay resident across the sequential grid).
        # Seeding in-kernel instead of aliasing a zeros input keeps ONE VMEM
        # copy of the accumulators — the aliased-input variant doubled the
        # footprint and gated the kernel off at the 256x128 flagship shape,
        # silently falling back to XLA assembly.
        @pl.when(c0 == 0)
        def _():
            ata_ref[...] = jnp.zeros_like(ata_ref)
            atb_ref[...] = jnp.zeros_like(atb_ref)

        # per-chunk entry tiles: C_st[i][j] as (E, B)
        for pi, (s, t) in enumerate(pair_st):
            js = jac_refs[s]
            jt = jac_refs[t]
            C = [[None] * d for _ in range(d)]
            for i in range(d):
                for j in range(d):
                    acc = None
                    for mm in range(m):
                        term = js[0, :, mm * d + i, :] * jt[0, :, mm * d + j, :]
                        acc = term if acc is None else acc + term
                    C[i][j] = acc  # (E, B)
            for e in range(E):
                ge = c0 * E + e  # global edge id into the full tables
                tgt = tgt_ref[pi, ge]
                tr = tr_ref[pi, ge] != 0
                ad = ad_ref[pi, ge] != 0
                base = tgt * SL
                for i in range(d):
                    for j in range(d):
                        v = jnp.where(tr, C[j][i][e], C[i][j][e])
                        v = v + jnp.where(ad, C[j][i][e], 0.0)
                        row = base + i * d + j
                        ata_ref[row, :] = ata_ref[row, :] + v

        # Atb: -J_s^T err per slot
        for s in range(n_slots_b):
            js = jac_refs[s]
            g = [None] * d
            for i in range(d):
                acc = None
                for mm in range(m):
                    term = js[0, :, mm * d + i, :] * err_ref[0, :, mm, :]
                    acc = term if acc is None else acc + term
                g[i] = acc  # (E, B)
            for e in range(E):
                base = gv_ref[s, c0 * E + e] * SV
                for i in range(d):
                    row = base + i
                    atb_ref[row, :] = atb_ref[row, :] - g[i][e]

    return kernel


@lru_cache(maxsize=None)
def _build_call(n_pairs, pair_st, n_slots_b, d, m, E, SL, SV, k_chunks,
                bsz, n_slots, n_vars, dtype_name, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    kernel = _bucket_kernel(n_pairs, pair_st, n_slots_b, d, m, E, SL, SV)

    def edge_spec(rows):
        return pl.BlockSpec(
            (1, E, rows, bsz), lambda c, *_: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def acc_spec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def call(tgt, tr, ad, gv, jacs, err):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(k_chunks,),
            in_specs=[edge_spec(m * d)] * n_slots_b + [edge_spec(m)],
            out_specs=(acc_spec(), acc_spec()),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_slots * SL, bsz), dtype),
                jax.ShapeDtypeStruct((n_vars * SV, bsz), dtype),
            ),
            # Mosaic's default VMEM cap rejects the ~12 MB resident
            # accumulators at the 256x128 flagship shape; the gate
            # (assemble_fits) guarantees we stay under this explicit limit
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=15 * 1024 * 1024
            ),
            interpret=interpret,
        )(tgt, tr, ad, gv, *jacs, err)

    return call


_VMEM_BUDGET = 13 * 1024 * 1024
_EDGE_CHUNK = 8


def assemble_fits(pattern, blocks, bsz) -> bool:
    d = pattern.d
    SL, SV = _round8(d * d), _round8(d)
    # VMEM tiles pad the lane (last) dim to 128: a batch-1 column still
    # occupies full 128-lane tiles
    lanes = ((bsz + 127) // 128) * 128
    # accumulators appear ONCE (zero-seeded in kernel; per-bucket outputs
    # are summed in XLA, so no aliased input copy)
    acc = (pattern.n_slots * SL + pattern.n_vars * SV) * lanes * 4
    # per-edge tiles follow the kernel's in_specs: each jac slot is an
    # (E, m*d) tile and err an (E, m) tile, with m the bucket's residual
    # dim (err.shape[2]) — NOT d*d (a dim-m patch residual over dof-d vars
    # needs m*d rows; sizing by d*d under-reserves when m > d and
    # over-reserves when m < d)
    per_bucket = max(
        (
            len(jacs) * _EDGE_CHUNK * _round8(err.shape[2] * d)
            + _EDGE_CHUNK * _round8(err.shape[2])
        )
        * lanes
        * 4
        for jacs, err in blocks
    )
    return acc + per_bucket <= _VMEM_BUDGET


def assemble_pallas(pattern, co, blocks, interpret: bool = False):
    """Drop-in for assemble.assemble on fitting problems."""
    from .assemble import _pad_jac

    d = pattern.d
    SL, SV = _round8(d * d), _round8(d)
    some_err = blocks[0][1]
    bsz = some_err.shape[1]
    dtype = some_err.dtype

    ata2d = None
    atb2d = None

    for bi, (jacs, err) in enumerate(blocks):
        jacs_p = [_pad_jac(j, d) for j in jacs]
        k = err.shape[0]
        m = err.shape[2]
        E = _EDGE_CHUNK
        kp = ((k + E - 1) // E) * E
        pad = kp - k

        def soa(x, rows):
            # (k, B, m, d|1) -> (k_chunks, E, rows, B)
            x = jnp.moveaxis(x.reshape(x.shape[0], bsz, rows), 1, -1)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, rows, bsz), dtype=x.dtype)], axis=0
                )
            return x.reshape(kp // E, E, rows, bsz)

        jac_soa = tuple(soa(j, m * d) for j in jacs_p)
        err_soa = soa(err, m)

        sched = pattern.bucket_pair_sched[bi]
        n_pairs = len(sched)
        pair_st = tuple((s, t) for (s, t, _, _, _) in sched)

        def pad_tab(a, fill=0):
            a = np.asarray(a, np.int32)
            return np.concatenate([a, np.full((pad,), fill, np.int32)])

        tgt = np.stack([pad_tab(tg) for (_, _, tg, _, _) in sched])
        tr = np.stack([pad_tab(nt.astype(np.int32)) for (_, _, _, nt, _) in sched])
        ad = np.stack([pad_tab(adg.astype(np.int32)) for (_, _, _, _, adg) in sched])
        gv = np.stack([pad_tab(g) for g in pattern.bucket_gvars[bi]])

        call = _build_call(
            n_pairs, pair_st, len(jacs_p), d, m, E, SL, SV, kp // E,
            bsz, pattern.n_slots, pattern.n_vars,
            jnp.dtype(dtype).name, interpret,
        )
        ata_b, atb_b = call(
            jnp.asarray(tgt), jnp.asarray(tr), jnp.asarray(ad),
            jnp.asarray(gv), jac_soa, err_soa,
        )
        ata2d = ata_b if ata2d is None else ata2d + ata_b
        atb2d = atb_b if atb2d is None else atb2d + atb_b

    ata = jnp.moveaxis(
        ata2d.reshape(pattern.n_slots, SL, bsz)[:, : d * d], 1, -1
    ).reshape(pattern.n_slots, bsz, d, d)
    atb = jnp.moveaxis(
        atb2d.reshape(pattern.n_vars, SV, bsz)[:, :d], 1, -1
    )

    # identity on padding dims of diagonal blocks (same epilogue as XLA path)
    diag_slots = np.arange(1, pattern.n_vars + 1)
    eye_pad = jnp.einsum(
        "nd,de->nde", jnp.asarray(pattern.pad_diag, dtype),
        jnp.eye(d, dtype=dtype),
    ) * jnp.eye(d, dtype=dtype)
    ata = ata.at[diag_slots].add(eye_pad[:, None])
    return ata, atb
