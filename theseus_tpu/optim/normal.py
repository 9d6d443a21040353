"""Normal-equation system abstraction: dense and block-sparse backends.

The reference separates Linearization (dense_linearization.py:16,
sparse_linearization.py:19) from LinearSolver (5 classes); here both collapse
into a `NormalSystem` built per iteration inside jit: it exposes exactly what
the outer optimizers need — solve (damped), Atb, the quadratic form v^T AtA v
and the AtA diagonal — so GN/LM/Dogleg are backend-agnostic."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compiled import CompiledObjective
from ..sparse.assemble import apply_block_damping, assemble, build_block_pattern
from ..sparse.cholesky import NumericSchedule, factorize, solve_with_factor, sparse_block_solve
from ..sparse.structure import symbolic_factor
from .linear import DenseCholeskySolver, damping_diag


class DenseNormal:
    def __init__(self, AtA, Atb, solver):
        self.AtA = AtA
        self.Atb = Atb
        self.solver = solver

    def solve(self, damping=0.0, ellipsoidal=False, rhs_shift=None):
        rhs = self.Atb if rhs_shift is None else self.Atb - rhs_shift
        return self.solver.solve(self.AtA, rhs, damping, ellipsoidal)

    def quad(self, v):
        return jnp.einsum("bi,bij,bj->b", v, self.AtA, v)

    def diag(self):
        return jnp.diagonal(self.AtA, axis1=-2, axis2=-1)


class DenseNormalBuilder:
    def __init__(self, co: CompiledObjective, solver=None):
        self.co = co
        self.solver = solver or DenseCholeskySolver()

    def build(self, state, aux, detach_hessian: bool = False) -> DenseNormal:
        A, b = self.co.dense_A_b(state, aux)
        A_h = jax.lax.stop_gradient(A) if detach_hessian else A
        AtA = jnp.einsum("bmi,bmj->bij", A_h, A_h)
        Atb = jnp.einsum("bmi,bm->bi", A, b)
        return DenseNormal(AtA, Atb, self.solver)


class SparseNormal:
    def __init__(self, builder: "SparseNormalBuilder", ata, atb_blocks):
        self.builder = builder
        self.ata = ata  # (n_slots, B, d, d)
        self.atb_blocks = atb_blocks  # (n, B, d)
        self.Atb = builder.flatten(atb_blocks)  # (B, D)

    def solve(self, damping=0.0, ellipsoidal=False, rhs_shift=None):
        bld = self.builder
        ata = apply_block_damping(
            bld.pattern, self.ata, damping, ellipsoidal, bld.damping_eps
        )
        rhs = self.atb_blocks
        if rhs_shift is not None:
            rhs = rhs - bld.unflatten(rhs_shift)
        if bld.solver == "pcg":
            from ..sparse.pcg import pcg_block_solve

            x = pcg_block_solve(bld.pcg_sched, ata, rhs, bld.pcg_iters, bld.pcg_tol)
        else:
            x = sparse_block_solve(bld.sched, ata, rhs)
        delta = bld.flatten(x)
        bad = jnp.any(~jnp.isfinite(delta), axis=-1)
        delta = jnp.where(bad[..., None], 0.0, delta)
        return delta, bad

    def quad(self, v):
        bld = self.builder
        vb = bld.unflatten(v)  # (n, B, d)
        vi, vj = vb[bld.bw_ii], vb[bld.bw_jj]
        blocks = self.ata[bld.bw_slots]  # (S, B, d, d)
        terms = jnp.einsum("sbi,sbij,sbj->sb", vi, blocks, vj)
        w = jnp.where(jnp.asarray(bld.bw_isdiag), 1.0, 2.0)[:, None]
        return jnp.sum(terms * w, axis=0)

    def diag(self):
        bld = self.builder
        dblocks = self.ata[1 : bld.pattern.n_vars + 1]  # (n, B, d, d)
        dd = jnp.diagonal(dblocks, axis1=-2, axis2=-1)  # (n, B, d)
        return bld.flatten(dd)


class SparseNormalBuilder:
    """Owns the static symbolic state (pattern, schedule, flatten tables)."""

    def __init__(self, co: CompiledObjective, ordering: str = "auto",
                 damping_eps: float = 1e-8, solver: str = "direct",
                 pcg_iters: int = 100, pcg_tol: float = 1e-10):
        self.co = co
        self.damping_eps = damping_eps
        self.solver = solver
        self.pcg_iters = pcg_iters
        self.pcg_tol = pcg_tol
        self.pattern = build_block_pattern(co)
        if solver == "pcg":
            from ..sparse.pcg import PCGSchedule

            self.sym = None
            self.sched = None
            self.pcg_sched = PCGSchedule(self.pattern)
        else:
            from .ordering import resolve_ordering

            ordering = resolve_ordering(ordering, co.var_names)
            if isinstance(ordering, str) and ordering == "auto":
                # rank nd (shallow levels) vs amd (min fill) by the modeled
                # device cost — bipartite/BA graphs blow up under nd
                # (92%-dense fill measured at 16x200 BA) while chain/mesh
                # PGO graphs are dispatch-bound under amd's deep etree
                from ..sparse.structure import symbolic_factor_auto

                self.sym = symbolic_factor_auto(
                    self.pattern.n_vars, self.pattern.pairs, self.pattern.d
                )
            else:
                self.sym = symbolic_factor(
                    self.pattern.n_vars, self.pattern.pairs, self.pattern.d,
                    ordering,
                )
            self.sched = NumericSchedule(self.sym, self.pattern)

        # flatten tables: (n, B, d) <-> (B, total_dof)
        d = self.pattern.d
        sel = []
        for i, dv in enumerate(self.pattern.var_dofs):
            sel.extend(range(i * d, i * d + int(dv)))
        self._sel = np.asarray(sel)
        self._n_total_pad = self.pattern.n_vars * d
        self.total_dof = len(sel)

        items = sorted(self.pattern.pair_slot.items(), key=lambda kv: kv[1])
        self.bw_ii = np.array([k[0] for k, _ in items])
        self.bw_jj = np.array([k[1] for k, _ in items])
        self.bw_slots = np.array([s for _, s in items])
        self.bw_isdiag = self.bw_ii == self.bw_jj

    def flatten(self, blocks):
        """(n, B, d) -> (B, total_dof)."""
        bsz = blocks.shape[1]
        flat = jnp.moveaxis(blocks, 0, 1).reshape(bsz, self._n_total_pad)
        return flat[:, self._sel]

    def unflatten(self, v):
        """(B, total_dof) -> (n, B, d) with zero padding."""
        bsz = v.shape[0]
        flat = jnp.zeros((bsz, self._n_total_pad), dtype=v.dtype)
        flat = flat.at[:, self._sel].set(v)
        return jnp.moveaxis(
            flat.reshape(bsz, self.pattern.n_vars, self.pattern.d), 1, 0
        )

    def build(self, state, aux, detach_hessian: bool = False) -> SparseNormal:
        blocks = self.co.linearize_blocks(state, aux)
        ata, atb = assemble(self.pattern, self.co, blocks)
        if detach_hessian:
            ata = jax.lax.stop_gradient(ata)
        return SparseNormal(self, ata, atb)
