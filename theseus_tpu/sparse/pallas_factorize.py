"""Pallas per-level kernels for the block-sparse Cholesky.

The level-sweep factorization (`cholesky._factorize_levels`) lowers each
etree level to ~80 XLA ops (gathers, a batched small einsum, an unrolled
d<=8 POTRF, a TRSM, scatters); with ~16 levels the per-op overhead rivals
the arithmetic. This module fuses the arithmetic of one level — update
accumulation, POTRF, TRSM — into ONE Mosaic kernel in struct-of-arrays
layout: every block entry is a (B,)-lane vector, the batch rides the 128
lanes, and the d*d block structure is unrolled scalar code on the VPU
(the same layout recipe as ops/pallas_between_soa.py). Gathers/scatters of
the level's operands stay in XLA, which streams them at HBM bandwidth.

Used by `cholesky.factorize` when `config.pallas_enabled(dtype)` and the
level shapes fit VMEM; always verified against the pure-JAX path in tests.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _level_kernel(d: int, rl: int, ul: int):
    """Kernel for one level: col_a (1, rl, d*d, B), ks (1, ul, rl, d*d, B),
    kj (1, ul, d*d, B) -> newcol (1, rl, d*d, B).

    newcol[0]  = chol(sym(col_a[0] - upd[0]))
    newcol[r>] = (col_a[r] - upd[r]) @ L^{-T}
    upd[r,i,j] = sum_u sum_k ks[u,r,i,k] * kj[u,j,k]
    """

    def kernel(a_ref, ks_ref, kj_ref, out_ref):
        # -- update accumulation ---------------------------------------
        # upd[(i,j)] (rl, B) = sum_u sum_k ks[u,:,ik,:] * kj[u,jk,:].
        # Mosaic cannot lower leading-dim multi_reductions (3D -> 2D), so the
        # u-sum is a fori_loop whose body touches only 2D (rl, B) tiles.
        def u_body(u, accs):
            out = []
            for i in range(d):
                for j in range(d):
                    acc = accs[i * d + j]
                    for k in range(d):
                        ks_s = ks_ref[0, u, :, i * d + k, :]  # (rl, B)
                        kj_s = kj_ref[0, u, j * d + k, :]  # (B,)
                        acc = acc + ks_s * kj_s[None, :]
                    out.append(acc)
            return tuple(out)

        bsz = a_ref.shape[-1]
        zero = jnp.zeros((rl, bsz), dtype=a_ref.dtype)
        upd = jax.lax.fori_loop(0, ul, u_body, (zero,) * (d * d))

        # c[r][i][j]: (B,) lanes for r=0 (diag), (rl-1, B) for the rest
        c = [[[None] * d for _ in range(d)] for _ in range(rl)]
        for i in range(d):
            for j in range(d):
                full = a_ref[0, :, i * d + j, :] - upd[i * d + j]  # (rl, B)
                for r in range(rl):
                    c[r][i][j] = full[r]

        # -- POTRF on the symmetrized diagonal block -------------------
        l = [[None] * d for _ in range(d)]
        inv = [None] * d
        for j in range(d):
            s = 0.5 * (c[0][j][j] + c[0][j][j])
            for k in range(j):
                s = s - l[j][k] * l[j][k]
            ljj = jnp.sqrt(s)
            l[j][j] = ljj
            inv[j] = 1.0 / ljj
            for i in range(j + 1, d):
                s = 0.5 * (c[0][i][j] + c[0][j][i])
                for k in range(j):
                    s = s - l[i][k] * l[j][k]
                l[i][j] = s * inv[j]
        for i in range(d):
            for j in range(d):
                out_ref[0, 0, i * d + j, :] = (
                    l[i][j] if j <= i else jnp.zeros_like(l[0][0])
                )

        # -- TRSM: rest rows X = C_r L^{-T} ----------------------------
        if rl > 1:
            x = [[None] * d for _ in range(d)]  # each (rl-1, B)
            for i in range(d):
                for j in range(d):
                    s = jnp.stack([c[r][i][j] for r in range(1, rl)], axis=0)
                    for k in range(j):
                        s = s - x[i][k] * l[j][k][None, :]
                    x[i][j] = s * inv[j][None, :]
            for i in range(d):
                for j in range(d):
                    out_ref[0, 1:, i * d + j, :] = x[i][j]

    return kernel


@lru_cache(maxsize=None)
def _build_call(d: int, rl: int, ul: int, bsz: int, dtype_name: str,
                interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    dd = d * d

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda c: (c,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def call(col_a, ks, kj):
        C = col_a.shape[0]
        return pl.pallas_call(
            _level_kernel(d, rl, ul),
            grid=(C,),
            in_specs=[
                spec((rl, dd, bsz)),
                spec((ul, rl, dd, bsz)),
                spec((ul, dd, bsz)),
            ],
            out_specs=spec((rl, dd, bsz)),
            out_shape=jax.ShapeDtypeStruct((C, rl, dd, bsz), dtype),
            interpret=interpret,
        )(col_a, ks, kj)

    return call


def level_eliminate_soa(col_a, ks, kj, d: int, interpret: bool = False):
    """SoA level elimination. col_a (C, rl, d*d, B), ks (C, ul, rl, d*d, B),
    kj (C, ul, d*d, B) -> newcol (C, rl, d*d, B)."""
    C, rl, dd, bsz = col_a.shape
    ul = ks.shape[1]
    call = _build_call(d, rl, ul, bsz, jnp.dtype(col_a.dtype).name, interpret)
    return call(col_a, ks, kj)


# VMEM budget gate: per-program blocks must fit comfortably on chip.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def level_fits(d: int, rl: int, ul: int, bsz: int, itemsize: int = 4) -> bool:
    # lane padding: a batch-1 column still occupies full 128-lane tiles
    lanes = ((bsz + 127) // 128) * 128
    blocks = (rl + ul * rl + ul + rl) * d * d * lanes * itemsize
    return blocks <= _VMEM_BUDGET_BYTES


def aos_to_soa(x):
    """(S, B, d, d) -> (S, d*d, B)."""
    s, b = x.shape[0], x.shape[1]
    return jnp.moveaxis(x.reshape(s, b, -1), 1, -1)


def soa_to_aos(x, d: int):
    """(S, d*d, B) -> (S, B, d, d)."""
    s, b = x.shape[0], x.shape[-1]
    return jnp.moveaxis(x, -1, 1).reshape(s, b, d, d)


# ---------------------------------------------------------------------------
# substitution kernels: one Mosaic program per column for the per-level
# forward (L y = b) and backward (L^T x = y) sweeps of cholesky._solve_levels
# ---------------------------------------------------------------------------


def _fwd_sub_kernel(d: int, ul: int):
    """acc = b - sum_u Ljk[u] @ yk[u]; then lower-triangular solve with the
    diagonal block. Blocks: ljk (1, ul, d*d, B), yk (1, ul, d, B),
    b (1, d, B), ldiag (1, d*d, B) -> y (1, d, B)."""

    def kernel(ljk_ref, yk_ref, b_ref, ld_ref, out_ref):
        acc = [b_ref[0, i, :] for i in range(d)]

        def u_body(u, acc):
            out = []
            for i in range(d):
                a = acc[i]
                for j in range(d):
                    a = a - ljk_ref[0, u, i * d + j, :] * yk_ref[0, u, j, :]
                out.append(a)
            return tuple(out)

        acc = jax.lax.fori_loop(0, ul, u_body, tuple(acc))

        y = [None] * d
        for i in range(d):
            s = acc[i]
            for k in range(i):
                s = s - ld_ref[0, i * d + k, :] * y[k]
            y[i] = s / ld_ref[0, i * d + i, :]
        for i in range(d):
            out_ref[0, i, :] = y[i]

    return kernel


def _bwd_sub_kernel(d: int, rl: int):
    """acc = y - sum_{r>=1} Lcol[r]^T x[row_r]; then solve L^T x = acc.
    Blocks: lcol (1, rl, d*d, B), xr (1, rl, d, B) (row 0 ignored, invalid
    rows pre-zeroed), y (1, d, B); lcol[0] is the diagonal block."""

    def kernel(lcol_ref, xr_ref, y_ref, out_ref):
        acc = [y_ref[0, j, :] for j in range(d)]
        if rl > 1:

            def r_body(r, acc):
                out = []
                for j in range(d):
                    a = acc[j]
                    for i in range(d):
                        a = a - lcol_ref[0, r, i * d + j, :] * xr_ref[0, r, i, :]
                    out.append(a)
                return tuple(out)

            acc = jax.lax.fori_loop(1, rl, r_body, tuple(acc))

        x = [None] * d
        for j in reversed(range(d)):
            s = acc[j]
            for k in range(j + 1, d):
                s = s - lcol_ref[0, 0, k * d + j, :] * x[k]
            x[j] = s / lcol_ref[0, 0, j * d + j, :]
        for j in range(d):
            out_ref[0, j, :] = x[j]

    return kernel


@lru_cache(maxsize=None)
def _build_sub_call(kind: str, d: int, n2: int, bsz: int, dtype_name: str,
                    interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    dd = d * d

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda c: (c,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    if kind == "fwd":
        kernel = _fwd_sub_kernel(d, n2)
        in_specs = [spec((n2, dd, bsz)), spec((n2, d, bsz)),
                    spec((d, bsz)), spec((dd, bsz))]
    else:
        kernel = _bwd_sub_kernel(d, n2)
        in_specs = [spec((n2, dd, bsz)), spec((n2, d, bsz)), spec((d, bsz))]

    def call(*args):
        C = args[0].shape[0]
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=in_specs,
            out_specs=spec((d, bsz)),
            out_shape=jax.ShapeDtypeStruct((C, d, bsz), dtype),
            interpret=interpret,
        )(*args)

    return call


def fwd_sub_level(ljk, yk, b, ldiag, d: int, interpret: bool = False):
    """(C, ul, d*d, B), (C, ul, d, B), (C, d, B), (C, d*d, B) -> (C, d, B)."""
    call = _build_sub_call("fwd", d, ljk.shape[1], ljk.shape[-1],
                           jnp.dtype(ljk.dtype).name, interpret)
    return call(ljk, yk, b, ldiag)


def bwd_sub_level(lcol, xr, y, d: int, interpret: bool = False):
    """(C, rl, d*d, B), (C, rl, d, B), (C, d, B) -> (C, d, B)."""
    call = _build_sub_call("bwd", d, lcol.shape[1], lcol.shape[-1],
                           jnp.dtype(lcol.dtype).name, interpret)
    return call(lcol, xr, y)
