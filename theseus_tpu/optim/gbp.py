"""Gaussian Belief Propagation (GBP) solver over the factor graph.

Beyond-reference feature (the reference ships ManifoldGaussian +
local/retract_gaussian as GBP building blocks, theseus/optimizer/
manifold_gaussian.py:14, but no GBP optimizer). This is the TPU-native
realization: synchronous (Jacobi-style) message passing, which is exactly
the schedule that maps to the hardware — every factor->variable message in
the graph is computed in one batched step per sweep (vmap over the compiled
objective's schema buckets), and variable beliefs are static-index
scatter-adds. No sequential graph traversal anywhere, so the whole solver
jits to a fixed program: `lax.scan` over sweeps inside the standard
nonlinear carry protocol.

Math (information form; Ortiz et al., "A visual introduction to Gaussian
belief propagation", 2021): each factor with stacked (weighted) jacobian
J = [J_1 .. J_k] and residual r at the linearization point carries the
local gaussian  Lam = J^T J,  eta = -J^T r  over its variables' tangent
coordinates. A factor->slot-s message marginalizes the factor gaussian plus
the cavity beliefs (belief minus own message) of the other slots:

    M        = Lam_oo + diag(cavity_o)            (o = all slots != s)
    lam_msg  = Lam_ss - Lam_so M^{-1} Lam_os
    eta_msg  = eta_s  - Lam_so M^{-1} (eta_o + cavity_eta_o)

Variable beliefs are the sums of incoming messages plus a small prior
ridge (gauge anchoring comes from the graph's own prior factors). With
enough sweeps the belief means solve the Gauss-Newton normal equations
exactly on tree graphs and approximately (empirically well) on loopy ones,
so GBP slots in as one more `NormalSystem` backend: the same object serves
the forward solve, the implicit backward's final detached-Hessian step and
DLM (layer.py:157,319), and LM-style diagonal damping (a per-batch prior).

GBPNormal.marginals() additionally exposes the per-variable posterior
information (the thing direct solvers cannot give without a dense inverse),
as `ManifoldGaussian`s in the tangent plane at the solution.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compiled import CompiledObjective
from ..sparse.assemble import build_block_pattern
from .gaussian import ManifoldGaussian
from .nonlinear import NLSOptions, NonlinearLeastSquares


@dataclasses.dataclass(frozen=True)
class GBPOptions(NLSOptions):
    """Static GBP knobs (hashable; part of the jit cache key)."""

    msg_iters: int = 30  # synchronous sweeps per linearization
    msg_damping: float = 0.3  # new_msg = (1-a)*computed + a*old (loopy graphs)
    gbp_ridge: float = 1e-6  # per-variable prior precision (numeric anchor)


def _blk(lam_b, s: int, t: int):
    """Factor precision block Lam[s][t] from the upper-triangular storage
    lam_b[s][t-s] (s<=t); lower blocks are transposes."""
    if s <= t:
        return lam_b[s][t - s]
    return jnp.swapaxes(lam_b[t][s - t], -1, -2)


class GBPNormal:
    """Message-passing view of the normal equations J^T J dx = -J^T r."""

    def __init__(self, builder: "GBPNormalBuilder", lams, etas, dtype, bsz):
        self.builder = builder
        # per bucket: lams[bi][s][t-s] (K, B, d, d) for s<=t (upper tri);
        # etas[bi][s] (K, B, d)
        self.lams = lams
        self.etas = etas
        self.dtype = dtype
        self.bsz = bsz
        self._Atb = None

    # -- NormalSystem protocol -----------------------------------------
    @property
    def Atb(self):
        if self._Atb is None:
            eta_v = self._scatter_eta(
                jnp.zeros((self.builder.n, self.bsz, self.builder.d), self.dtype),
                self.etas,
            )
            self._Atb = self.builder.flatten(eta_v)
        return self._Atb

    def diag(self):
        lam_v = jnp.zeros(
            (self.builder.n, self.bsz, self.builder.d), self.dtype
        )
        for bi, lam_b in enumerate(self.lams):
            for s in range(len(lam_b)):
                lam_v = lam_v.at[self.builder.gvars[bi][s]].add(
                    jnp.diagonal(_blk(lam_b, s, s), axis1=-2, axis2=-1)
                )
        return self.builder.flatten(lam_v)

    def quad(self, v):
        vb = self.builder.unflatten(v)  # (n, B, d)
        out = 0.0
        for bi, lam_b in enumerate(self.lams):
            k = len(lam_b)
            for s in range(k):
                vs = vb[self.builder.gvars[bi][s]]  # (K, B, d)
                for t in range(s, k):
                    vt = vb[self.builder.gvars[bi][t]]
                    term = jnp.einsum(
                        "kbi,kbij,kbj->b", vs, _blk(lam_b, s, t), vt
                    )
                    out = out + (term if s == t else 2.0 * term)
        return out

    # -- message passing -------------------------------------------------
    def _scatter_eta(self, eta_v, etas):
        for bi, bucket in enumerate(etas):
            for s, e in enumerate(bucket):
                eta_v = eta_v.at[self.builder.gvars[bi][s]].add(e)
        return eta_v

    def _beliefs(self, msgs, prior_lam, prior_eta):
        lam_v, eta_v = prior_lam, prior_eta
        for bi, bucket in enumerate(msgs):
            for s, (e, l) in enumerate(bucket):
                gv = self.builder.gvars[bi][s]
                eta_v = eta_v.at[gv].add(e)
                lam_v = lam_v.at[gv].add(l)
        return lam_v, eta_v

    def _sweep(self, msgs, prior_lam, prior_eta, alpha):
        bld = self.builder
        lam_v, eta_v = self._beliefs(msgs, prior_lam, prior_eta)
        new_msgs = []
        for bi, bucket in enumerate(msgs):
            k = len(bucket)
            lam_b, eta_b = self.lams[bi], self.etas[bi]
            out_bucket = []
            for s in range(k):
                if k == 1:
                    out_bucket.append((eta_b[0], _blk(lam_b, 0, 0)))
                    continue
                others = [o for o in range(k) if o != s]
                # cavity of the other slots: belief minus own message
                cav = [
                    (
                        eta_v[bld.gvars[bi][o]] - bucket[o][0],
                        lam_v[bld.gvars[bi][o]] - bucket[o][1],
                    )
                    for o in others
                ]
                # M = Lam_oo + diag(cavity); R = Lam_{o,s}; r = eta_o + cav
                rows = []
                for a, o in enumerate(others):
                    row = [
                        _blk(lam_b, o, o2) + (cav[a][1] if o == o2 else 0.0)
                        for o2 in others
                    ]
                    rows.append(jnp.concatenate(row, axis=-1))
                M = jnp.concatenate(rows, axis=-2)  # (K,B,(k-1)d,(k-1)d)
                R = jnp.concatenate(
                    [_blk(lam_b, o, s) for o in others], axis=-2
                )  # (K,B,(k-1)d,d)
                r = jnp.concatenate(
                    [eta_b[o] + cav[a][0] for a, o in enumerate(others)],
                    axis=-1,
                )  # (K,B,(k-1)d)
                rhs = jnp.concatenate([R, r[..., None]], axis=-1)
                X = jnp.linalg.solve(M, rhs)
                Rt = jnp.swapaxes(R, -1, -2)
                lam_new = _blk(lam_b, s, s) - Rt @ X[..., :-1]
                eta_new = eta_b[s] - (Rt @ X[..., -1:])[..., 0]
                old_eta, old_lam = bucket[s]
                out_bucket.append(
                    (
                        (1.0 - alpha) * eta_new + alpha * old_eta,
                        (1.0 - alpha) * lam_new + alpha * old_lam,
                    )
                )
            new_msgs.append(tuple(out_bucket))
        return tuple(new_msgs)

    def _priors(self, damping, rhs_shift, ridge_val=None):
        bld = self.builder
        eye = jnp.eye(bld.d, dtype=self.dtype)
        base_ridge = bld.opts_ridge if ridge_val is None else ridge_val
        ridge = base_ridge + jnp.asarray(
            damping, self.dtype
        ).reshape((-1,) + (1,) * 2) * jnp.ones(
            (self.bsz, 1, 1), self.dtype
        )  # (B,1,1) LM damping as a diagonal prior
        # true dims: ridge; padding dims: identity (keeps M invertible)
        prior_lam = (
            jnp.asarray(bld.dof_mask_np, self.dtype)[:, None, :, None]
            * eye
            * ridge[None]
            + jnp.asarray(bld.pad_eye_np, self.dtype)[:, None]
        )  # (n, B, d, d)
        prior_eta = jnp.zeros((bld.n, self.bsz, bld.d), self.dtype)
        if rhs_shift is not None:
            prior_eta = prior_eta - bld.unflatten(rhs_shift)
        return prior_lam, prior_eta

    def _run(self, damping, rhs_shift=None, msg_iters=None, msg_damping=None,
             ridge=None):
        """Per-call overrides (msg_iters/msg_damping/ridge) let
        `forward(optimizer_kwargs={"msg_iters": ...})` take effect — the
        builder only provides defaults."""
        bld = self.builder
        prior_lam, prior_eta = self._priors(damping, rhs_shift, ridge)
        msgs = tuple(
            tuple(
                (jnp.zeros_like(e), jnp.zeros_like(_blk(lam_b, s, s)))
                for s, e in enumerate(eta_b)
            )
            for eta_b, lam_b in zip(self.etas, self.lams)
        )
        alpha = bld.msg_damping if msg_damping is None else float(msg_damping)
        iters = bld.msg_iters if msg_iters is None else int(msg_iters)

        def body(msgs, _):
            return self._sweep(msgs, prior_lam, prior_eta, alpha), None

        msgs, _ = jax.lax.scan(body, msgs, None, length=iters)
        lam_v, eta_v = self._beliefs(msgs, prior_lam, prior_eta)
        return lam_v, eta_v

    def solve(self, damping=0.0, ellipsoidal=False, rhs_shift=None,
              msg_iters=None, msg_damping=None, ridge=None):
        # ellipsoidal damping has no distributed analog here; the scalar
        # damping enters as a per-variable diagonal prior instead
        lam_v, eta_v = self._run(damping, rhs_shift, msg_iters, msg_damping,
                                 ridge)
        dx = jnp.linalg.solve(lam_v, eta_v[..., None])[..., 0]  # (n, B, d)
        dx = dx * jnp.asarray(self.builder.dof_mask_np, dx.dtype)[:, None, :]
        delta = self.builder.flatten(dx)
        bad = jnp.any(~jnp.isfinite(delta), axis=-1)
        return jnp.where(bad[..., None], 0.0, delta), bad

    def marginals(self, damping=0.0):
        """Posterior tangent-space information per variable: (mean_blocks
        (n, B, d), precision (n, B, d, d)), pads stripped by the caller."""
        lam_v, eta_v = self._run(damping)
        dx = jnp.linalg.solve(lam_v, eta_v[..., None])[..., 0]
        return dx, lam_v


class GBPNormalBuilder:
    """Static message-passing schedule derived from the compiled objective.

    Shares the block layout with the sparse backend (build_block_pattern,
    sparse/assemble.py:41): uniform padded dof `d`, global var ids per
    (bucket, slot), and the (n, B, d) <-> (B, total_dof) flatten tables."""

    def __init__(self, co: CompiledObjective, msg_iters: int = 30,
                 msg_damping: float = 0.3, ridge: float = 1e-6):
        self.co = co
        self.msg_iters = int(msg_iters)
        self.msg_damping = float(msg_damping)
        self.opts_ridge = float(ridge)
        pat = build_block_pattern(co)
        self.pattern = pat
        self.n, self.d = pat.n_vars, pat.d
        self.gvars = [
            [np.asarray(g) for g in gv] for gv in pat.bucket_gvars
        ]
        for bi, gv in enumerate(self.gvars):
            k = len(gv)
            for s in range(k):
                for t in range(s + 1, k):
                    if np.any(gv[s] == gv[t]):
                        raise ValueError(
                            "GBP does not support a cost that references "
                            f"the same variable in two slots (bucket {bi})"
                        )
        # numpy constants only: the builder is cached across traces, so any
        # jnp op result stored here would leak a tracer when the first
        # build happens inside jit/scan
        self.dof_mask_np = np.asarray(pat.dof_mask)  # (n, d)
        self.pad_eye_np = np.einsum(
            "nd,de->nde", np.asarray(pat.pad_diag), np.eye(self.d)
        )  # identity on padding dims
        sel = []
        for i, dv in enumerate(pat.var_dofs):
            sel.extend(range(i * self.d, i * self.d + int(dv)))
        self._sel = np.asarray(sel)
        self._n_total_pad = self.n * self.d
        self.total_dof = len(sel)

    def flatten(self, blocks):
        bsz = blocks.shape[1]
        flat = jnp.moveaxis(blocks, 0, 1).reshape(bsz, self._n_total_pad)
        return flat[:, self._sel]

    def unflatten(self, v):
        bsz = v.shape[0]
        flat = jnp.zeros((bsz, self._n_total_pad), dtype=v.dtype)
        flat = flat.at[:, self._sel].set(v)
        return jnp.moveaxis(flat.reshape(bsz, self.n, self.d), 1, 0)

    def build(self, state, aux, detach_hessian: bool = False) -> GBPNormal:
        blocks = self.co.linearize_blocks(state, aux)
        bsz = self.co.batch_size(state)
        dtype = self.co.state_dtype(state)
        d = self.d
        lams, etas = [], []
        for (jacs, werr) in blocks:
            jp = []
            for jac in jacs:  # (K, B, dim, dof) -> pad dof to d
                pad = d - jac.shape[-1]
                if pad:
                    jac = jnp.pad(jac, ((0, 0),) * 3 + ((0, pad),))
                jp.append(jac)
            jh = [jax.lax.stop_gradient(j) if detach_hessian else j for j in jp]
            k = len(jp)
            lam_b = tuple(
                tuple(
                    jnp.einsum("kbmi,kbmj->kbij", jh[s], jh[t])
                    for t in range(s, k)
                )
                for s in range(k)
            )
            eta_b = tuple(
                -jnp.einsum("kbmi,kbm->kbi", j, werr) for j in jp
            )
            lams.append(lam_b)
            etas.append(eta_b)
        return GBPNormal(self, tuple(lams), tuple(etas), dtype, bsz)


class GaussianBeliefPropagation(NonlinearLeastSquares):
    """Nonlinear solve by relinearize -> GBP sweeps -> retract.

    Plugs into the standard carry protocol, so `TheseusLayer(GBP(obj))`
    supports all four backward modes (the implicit/DLM final steps route
    through the same message-passing NormalSystem)."""

    method = "gbp"

    def __init__(self, objective, msg_iters: int = 30, msg_damping: float = 0.3,
                 gbp_ridge: float = 1e-6, **kwargs):
        kwargs.setdefault("abs_err_tolerance", 1e-10)
        kwargs.setdefault("rel_err_tolerance", 1e-8)
        super().__init__(objective, **kwargs)
        self.opts = GBPOptions(
            msg_iters=msg_iters,
            msg_damping=msg_damping,
            gbp_ridge=gbp_ridge,
            **{
                f.name: getattr(self.opts, f.name)
                for f in dataclasses.fields(NLSOptions)
            },
        )

    @property
    def normal_builder(self) -> GBPNormalBuilder:
        co = self.compiled
        nb = self._normal_builder
        opts = self.opts
        if (
            nb is None
            or nb.co is not co
            or nb.msg_iters != opts.msg_iters
            or nb.msg_damping != opts.msg_damping
            or nb.opts_ridge != opts.gbp_ridge
        ):
            self._normal_builder = GBPNormalBuilder(
                co, opts.msg_iters, opts.msg_damping, opts.gbp_ridge
            )
        return self._normal_builder

    def compute_delta(self, ns, damping, opts):
        return ns.solve(
            0.0, False,
            msg_iters=getattr(opts, "msg_iters", None),
            msg_damping=getattr(opts, "msg_damping", None),
            ridge=getattr(opts, "gbp_ridge", None),
        )

    # -- posterior marginals ---------------------------------------------
    def marginals(self, values=None, input_tensors=None
                  ) -> Dict[str, ManifoldGaussian]:
        """Solve, then return per-variable posterior ManifoldGaussians:
        mean = the solution variable, precision = the GBP belief information
        in the tangent plane at the mean (exact on tree graphs). This is the
        quantity the direct solvers can't expose without a dense inverse."""
        out, _ = self.optimize(values=values, input_tensors=input_tensors)
        co = self.compiled
        bsz = co.resolve_batch_size(out)
        state = co.pack(out, bsz)
        aux = co.build_aux(out, bsz)
        bld = self.normal_builder
        ns = bld.build(state, aux)
        _, lam_v = ns.marginals()
        res: Dict[str, ManifoldGaussian] = {}
        for i, name in enumerate(co.var_names):
            dv = int(bld.pattern.var_dofs[i])
            res[name] = ManifoldGaussian(
                mean=[out[name]],
                precision=lam_v[i][:, :dv, :dv],
                name=f"{name}_belief",
            )
        return res
