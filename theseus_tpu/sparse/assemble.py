"""Block AtA / Atb assembly from per-bucket jacobian blocks.

The TPU-native replacement for the reference's CSR-value writing + sparse
MtM kernels (optimizer/sparse_linearization.py:102, extlib/mat_mult.cu:36):
because the block pattern is static, assembly is a handful of batched
einsums (MXU) followed by scatter-adds with precomputed indices. All blocks
are padded to a uniform dof `d`; padding dims get identity diagonals.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compiled import CompiledObjective


@dataclasses.dataclass
class BlockPattern:
    """Static AtA block pattern + scatter schedules (numpy)."""

    n_vars: int
    d: int  # uniform (max) block dof
    var_dofs: np.ndarray  # (n,) true dof per var
    pair_slot: Dict[Tuple[int, int], int]  # canonical (i<=j) -> slot (1-based)
    n_slots: int  # number of stored blocks + 1 (slot 0 = zero sentinel)
    pairs: Set[Tuple[int, int]]  # off-diagonal canonical pairs
    # per bucket: list over (s, t) pairs of
    #   (s, t, tgt_slot (K,), needs_T (K,), also_diag (K,))
    bucket_pair_sched: List[List[Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]]]
    # per bucket: per slot s, global var ids (K,)
    bucket_gvars: List[List[np.ndarray]]
    pad_diag: np.ndarray  # (n, d) 1.0 on padding dims of each var's diag block
    dof_mask: np.ndarray  # (n, d) 1.0 on true dims


def build_block_pattern(co: CompiledObjective) -> BlockPattern:
    var_index = {n: i for i, n in enumerate(co.var_names)}
    n_vars = len(co.var_names)
    var_dofs = np.array([co.var_groups[n].dof for n in co.var_names])
    d = int(var_dofs.max())
    from .. import config as _config

    m = _config.SPARSE_BLOCK_PAD_MULTIPLE
    if m > 1:
        d = ((d + m - 1) // m) * m

    # fully vectorized pattern construction (a 2*10^5-observation BA family
    # would otherwise pay ~10^6 Python dict operations here):
    # global var id per slot from the tangent-column table, then one
    # np.unique over all off-diagonal (lo, hi) keys to number the slots.
    col2var = np.repeat(np.arange(n_vars, dtype=np.int32), var_dofs.astype(np.int64))

    bucket_gvars: List[List[np.ndarray]] = []
    raw_scheds: List[List] = []  # (s, t, lo, hi, needs_t, also_diag)
    all_off_keys = []
    for bk in co.buckets:
        gvars = [col2var[np.asarray(s.cols)[:, 0]] for s in bk.optim_slots]
        bucket_gvars.append(gvars)
        sched = []
        nslots = len(bk.optim_slots)
        for s in range(nslots):
            for t in range(s, nslots):
                a, b = gvars[s], gvars[t]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                # store J_s^T J_t at canonical orientation (lo, hi):
                # value is rows=lo, cols=hi; contribution C has rows=a
                needs_t = a > b
                # same var in two slots of one cost: diagonal gets C + C^T
                also_diag = (s != t) & (a == b)
                sched.append((s, t, lo, hi, needs_t, also_diag))
                off = lo != hi
                if off.any():
                    all_off_keys.append(
                        lo[off].astype(np.int64) * n_vars + hi[off]
                    )
        raw_scheds.append(sched)

    uniq_off = (
        np.unique(np.concatenate(all_off_keys))
        if all_off_keys
        else np.empty(0, np.int64)
    )
    # slots: 0 = zero sentinel, 1..n_vars = diagonal blocks, then
    # off-diagonal pairs in sorted-key order
    pair_slot: Dict[Tuple[int, int], int] = {
        (i, i): i + 1 for i in range(n_vars)
    }
    pairs: Set[Tuple[int, int]] = set()
    for r, key in enumerate(uniq_off):
        lo, hi = divmod(int(key), n_vars)
        pair_slot[(lo, hi)] = n_vars + 1 + r
        pairs.add((lo, hi))
    slot = n_vars + 1 + len(uniq_off)

    bucket_pair_sched: List[List] = []
    for sched in raw_scheds:
        out = []
        for (s, t, lo, hi, needs_t, also_diag) in sched:
            key = lo.astype(np.int64) * n_vars + hi
            tgt = np.where(
                lo == hi,
                lo + 1,
                n_vars + 1 + np.searchsorted(uniq_off, key),
            ).astype(np.int32)
            out.append((s, t, tgt, needs_t, also_diag))
        bucket_pair_sched.append(out)

    pad_diag = np.zeros((n_vars, d))
    dof_mask = np.zeros((n_vars, d))
    for i, dv in enumerate(var_dofs):
        pad_diag[i, dv:] = 1.0
        dof_mask[i, :dv] = 1.0

    return BlockPattern(
        n_vars=n_vars,
        d=d,
        var_dofs=var_dofs,
        pair_slot=pair_slot,
        n_slots=slot,
        pairs=pairs,
        bucket_pair_sched=bucket_pair_sched,
        bucket_gvars=bucket_gvars,
        pad_diag=pad_diag,
        dof_mask=dof_mask,
    )


def _pad_jac(jac, d):
    """(K, B, dim, dof) -> (K, B, dim, d)."""
    dof = jac.shape[-1]
    if dof == d:
        return jac
    pad = [(0, 0)] * (jac.ndim - 1) + [(0, d - dof)]
    return jnp.pad(jac, pad)


def assemble(pattern: BlockPattern, co: CompiledObjective, blocks):
    """blocks = co.linearize_blocks(state, aux). Returns
    (ata_flat (n_slots, B, d, d), atb (n_vars, B, d)); ata slot 0 is zeros;
    padding dims carry identity diagonals so factorization is well-posed.

    Differentiable w.r.t. blocks: the Pallas fast path carries a custom_vjp
    whose backward is the (bilinear, so exactly-transposable) XLA assembly —
    pallas_call has no JVP rule, and outer-loop gradients flow through Atb
    (implicit mode) or the whole assembly (unroll/truncated)."""
    some_err = blocks[0][1]
    bsz = some_err.shape[1]
    dtype = some_err.dtype

    from .. import config as _config
    from .refine import hp_dtype

    atb_hp = _config.ATB_HIGH_PRECISION and hp_dtype(dtype) != dtype

    if _config.pallas_enabled(dtype) and not _config._PALLAS_INTERPRET:
        from .pallas_assemble import assemble_fits, assemble_pallas

        if assemble_fits(pattern, blocks, bsz):

            @jax.custom_vjp
            def _asm(blocks):
                return assemble_pallas(pattern, co, blocks)

            def _asm_fwd(blocks):
                return assemble_pallas(pattern, co, blocks), blocks

            def _asm_bwd(res, ct):
                _, vjp = jax.vjp(
                    lambda b: _assemble_xla(pattern, co, b), res
                )
                return vjp(ct)

            _asm.defvjp(_asm_fwd, _asm_bwd)
            ata, atb = _asm(blocks)
            if atb_hp:
                # reference contract: Atb accumulated in double precision
                # (sparse_linearization.py:169-176); the kernel's f32 atb is
                # discarded and recomputed with f64 accumulation (one small
                # einsum; gradients flow through these ops directly)
                atb = _assemble_atb_hp(pattern, blocks, dtype)
            return ata, atb

    ata, atb = _assemble_xla(pattern, co, blocks)
    if atb_hp:
        atb = _assemble_atb_hp(pattern, blocks, dtype)
    return ata, atb


def _assemble_atb_hp(pattern: BlockPattern, blocks, dtype):
    """Atb = -sum J_s^T e accumulated in the high-precision dtype, cast back
    to the working dtype at the end (a relative-eps rounding of the VALUE,
    unlike term-wise f32 accumulation whose error is absolute in the term
    magnitudes and dominates the gradient near convergence)."""
    from .refine import hp_dtype

    hp = hp_dtype(dtype)
    d = pattern.d
    some_err = blocks[0][1]
    bsz = some_err.shape[1]
    atb = jnp.zeros((pattern.n_vars, bsz, d), dtype=hp)
    for bi, (jacs, err) in enumerate(blocks):
        err_h = err.astype(hp)
        for s, jac in enumerate(jacs):
            jac_h = _pad_jac(jac, d).astype(hp)
            contrib = -jnp.einsum(
                "kbmi,kbm->kbi", jac_h, err_h,
                precision=jax.lax.Precision.HIGHEST,
            )
            atb = atb.at[pattern.bucket_gvars[bi][s]].add(contrib)
    return atb.astype(dtype)


def _assemble_xla(pattern: BlockPattern, co: CompiledObjective, blocks):
    d = pattern.d
    some_err = blocks[0][1]
    bsz = some_err.shape[1]
    dtype = some_err.dtype

    ata = jnp.zeros((pattern.n_slots, bsz, d, d), dtype=dtype)
    atb = jnp.zeros((pattern.n_vars, bsz, d), dtype=dtype)

    # scatter-adds are slow on TPU; when the one-hot matrix is small enough,
    # turn the segment reduction into a matmul that runs on the MXU.
    # mask (static bool (k,)): only those columns contribute — encoded as
    # zero columns in the one-hot (no gather needed).
    def seg_add(dest, idx, contrib, n_out, mask=None):
        k = contrib.shape[0]
        if n_out * k <= (1 << 22):
            onehot = np.zeros((n_out, k), dtype=np.float32)
            sel = np.arange(k) if mask is None else np.flatnonzero(mask)
            onehot[idx[sel], sel] = 1.0
            flat = contrib.reshape(k, -1)
            add = jnp.einsum(
                "sk,kf->sf", jnp.asarray(onehot, dtype), flat
            ).reshape((n_out,) + contrib.shape[1:])
            return dest + add
        if mask is not None:
            m = jnp.asarray(mask, contrib.dtype).reshape(
                (k,) + (1,) * (contrib.ndim - 1))
            contrib = contrib * m
        return dest.at[idx].add(contrib)

    for bi, (jacs, err) in enumerate(blocks):
        jacs_p = [_pad_jac(j, d) for j in jacs]
        # Atb contributions -J_s^T e (b = -err convention), all slots batched
        # into ONE einsum + ONE segment reduction
        gvs = pattern.bucket_gvars[bi]
        jac_cat = jnp.concatenate(jacs_p, axis=0) if len(jacs_p) > 1 else jacs_p[0]
        err_cat = (
            jnp.concatenate([err] * len(jacs_p), axis=0) if len(jacs_p) > 1 else err
        )
        contrib = -jnp.einsum("kbmi,kbm->kbi", jac_cat, err_cat)
        atb = seg_add(atb, np.concatenate(gvs), contrib, pattern.n_vars)
        for (s, t, tgt, needs_t, also_diag) in pattern.bucket_pair_sched[bi]:
            # C = J_s^T J_t stored at canonical (lo, hi) orientation; edges
            # with needs_t store C^T. also_diag edges (same var in both slots
            # of one cost) accumulate C + C^T on the diagonal block.
            C = jnp.einsum("kbmi,kbmj->kbij", jacs_p[s], jacs_p[t])
            Cc = jnp.where(
                needs_t[:, None, None, None], jnp.swapaxes(C, -1, -2), C
            )
            ata = seg_add(ata, tgt, Cc, pattern.n_slots)
            if also_diag.any():
                extra = jnp.where(
                    also_diag[:, None, None, None], jnp.swapaxes(Cc, -1, -2), 0.0
                )
                ata = seg_add(ata, tgt, extra, pattern.n_slots)

    # identity on padding dims of diagonal blocks
    diag_slots = np.arange(1, pattern.n_vars + 1)
    eye_pad = jnp.einsum(
        "nd,de->nde", jnp.asarray(pattern.pad_diag, dtype), jnp.eye(d, dtype=dtype)
    ) * jnp.eye(d, dtype=dtype)
    ata = ata.at[diag_slots].add(eye_pad[:, None])
    return ata, atb


def apply_block_damping(pattern: BlockPattern, ata, damping, ellipsoidal: bool, eps: float):
    """diag <- diag*(1+a) + b on true dofs of diagonal blocks (the alpha/beta
    convention shared by all reference sparse backends,
    optimizer/linear/utils.py:14, extlib/mat_mult.cu:297)."""
    d = pattern.d
    dtype = ata.dtype
    damping = jnp.asarray(damping, dtype)
    if damping.ndim == 0:
        damping = jnp.broadcast_to(damping, (ata.shape[1],))
    if ellipsoidal:
        alpha, beta = damping, jnp.asarray(eps, dtype)
    else:
        alpha, beta = jnp.zeros_like(damping), damping
    diag_slots = np.arange(1, pattern.n_vars + 1)
    dmask = jnp.asarray(pattern.dof_mask, dtype)  # (n, d)
    dblocks = ata[diag_slots]  # (n, B, d, d)
    eye = jnp.eye(d, dtype=dtype)
    beta = jnp.broadcast_to(jnp.asarray(beta, dtype), alpha.shape)
    diag = jnp.diagonal(dblocks, axis1=-2, axis2=-1)  # (n, B, d)
    add = alpha[None, :, None] * diag + beta[None, :, None] * dmask[:, None, :]
    new_dblocks = dblocks + add[..., None] * eye
    return ata.at[diag_slots].set(new_dblocks)
