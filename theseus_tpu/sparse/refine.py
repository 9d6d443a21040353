"""Mixed-precision iterative refinement for the normal-equation solves.

The reference upcasts every sparse factor/solve to float64 internally and
casts back (reference optimizer/autograd/baspacho_sparse_autograd.py:41,
cholmod_sparse_autograd.py:34-37; Atb is accumulated by a double-precision
sparse_mtv at optimizer/sparse_linearization.py:169-176).  A straight f64
factorization would forfeit the MXU (TPUs emulate f64 in software), so the
TPU-native equivalent is classical mixed-precision iterative refinement:

    factor H once in f32            (all the d^3 work stays on the MXU)
    x_0 = L^-T L^-1 b               (f32 substitution)
    repeat k times:
        r = b - H x                 (residual accumulated in f64)
        x = x + L^-T L^-1 r         (f32 substitution, f64 accumulation)

With kappa(H) * eps_f32 < 1 (guaranteed in practice by LM damping) each
sweep contracts the error by ~kappa*eps_f32, so 1-2 sweeps reach the f64
solve plateau at a few percent of the factorization cost: the residual is
one block SpMV (O(nnz d^2 B)) against the factorization's O(nnz d^3 B).
On TPU the f64 pieces run in XLA's software-emulated double precision,
which the axon backend supports; if the process runs with x64 disabled the
refinement silently degrades to fixed-precision IR (still improves the
backward error, cannot beat the f32 forward-error bound).

Enabled by default with config.REFINE_STEPS = 1; the measured trajectory
parity vs the reference's f64 plateau lives in
evaluations/results_reference.md.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def hp_dtype(dtype):
    """The high-precision accumulation dtype available in this process."""
    if np.dtype(dtype) == np.dtype(np.float64):
        return jnp.dtype("float64")
    if jax.config.jax_enable_x64:
        return jnp.dtype("float64")
    return jnp.dtype(dtype)


def refine_active(dtype) -> bool:
    """True when the refinement tier can actually tighten the forward error.

    Active iff config.REFINE_STEPS > 0 AND a strictly higher-precision
    accumulation dtype exists in this process (x64 enabled and solving below
    f64). In a pure-f32 process fixed-precision IR would add one SpMV + one
    re-solve per iteration without beating the f32 forward-error bound, so
    the tier gates itself off — enabling x64 is the opt-in to the
    reference's f64-solve contract (the shipped examples and the accuracy
    evaluations do; see evaluations/results_reference.md)."""
    from .. import config as _config

    return _config.REFINE_STEPS > 0 and hp_dtype(dtype) != np.dtype(dtype)


class MatvecTables(NamedTuple):
    """Static gather tables for y = H x over canonical (i <= j) blocks."""

    ii: np.ndarray  # (S,) block-row of each stored slot
    jj: np.ndarray  # (S,) block-col
    slots: np.ndarray  # (S,) slot index into ata_flat
    off: np.ndarray  # (S,) bool, True where i != j


def matvec_tables(pair_slot) -> MatvecTables:
    items = sorted(pair_slot.items(), key=lambda kv: kv[1])
    ii = np.array([k[0] for k, _ in items], dtype=np.int32)
    jj = np.array([k[1] for k, _ in items], dtype=np.int32)
    slots = np.array([s for _, s in items], dtype=np.int32)
    return MatvecTables(ii=ii, jj=jj, slots=slots, off=ii != jj)


def block_matvec(tables: MatvecTables, ata_flat, x, out_dtype=None):
    """y = H x with H the symmetric matrix stored as canonical (i<=j) blocks.

    ata_flat (n_slots, B, d, d), x (n, B, d) -> y (n, B, d) in out_dtype
    (all products and the scatter accumulation run in out_dtype)."""
    out_dtype = out_dtype or x.dtype
    blocks = ata_flat[tables.slots].astype(out_dtype)  # (S, B, d, d)
    # diagonal blocks are read SYMMETRIZED, matching the factorization's
    # convention (cholesky.py reads 0.5*(D + D^T)); without this the
    # refined solve would target a slightly different operator than the
    # factor and the custom-VJP diag cotangent would stop being exact
    blocks = jnp.where(
        tables.off[:, None, None, None],
        blocks,
        0.5 * (blocks + jnp.swapaxes(blocks, -1, -2)),
    )
    xh = x.astype(out_dtype)
    # rows i get H_ij x_j; rows j of off-diagonal blocks get H_ij^T x_i
    yi = jnp.einsum("sbij,sbj->sbi", blocks, xh[tables.jj],
                    precision=jax.lax.Precision.HIGHEST)
    yj = jnp.einsum("sbij,sbi->sbj", blocks, xh[tables.ii],
                    precision=jax.lax.Precision.HIGHEST)
    y = jnp.zeros(x.shape, out_dtype)
    y = y.at[tables.ii].add(yi)
    off = tables.off
    y = y.at[tables.jj[off]].add(yj[off])
    return y


def refine(
    inner_solve: Callable,
    matvec: Callable,
    b,
    x0,
    steps: int,
):
    """x ~= H^{-1} b by iterative refinement around a low-precision solver.

    inner_solve(r) must apply the SAME (damped) operator's approximate
    inverse that produced x0; matvec(x) must apply the damped H with
    high-precision accumulation and return hp-dtype values."""
    if steps <= 0:
        return x0
    hp = hp_dtype(b.dtype)
    xh = x0.astype(hp)
    bh = b.astype(hp)
    for _ in range(steps):
        r = bh - matvec(xh)
        dx = inner_solve(r.astype(b.dtype))
        xh = xh + dx.astype(hp)
    return xh.astype(b.dtype)
