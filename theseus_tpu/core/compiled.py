"""Trace-time compiler: Objective -> pure batched residual/jacobian functions.

This subsumes the reference's `Vectorize` machinery (theseus/core/vectorizer.py:
112): cost functions are bucketed by schema ONCE at compile time, member
variables are gathered from per-type stacked state arrays with static index
arrays, and each bucket's per-instance residual function is evaluated under
`vmap(vmap(...))` over (instances, batch). There is no runtime cache
invalidation — structural change triggers recompilation (the JAX analog of the
reference's version counter, core/objective.py:111).

State layout:
  state: {type_key: (N_t, B, *elem_shape)}   — one stacked array per manifold
  delta: (B, total_dof)                       — tangent vector, insertion order
  aux:   tuple over buckets of (cf_aux, w_aux, robust_aux) stacked arrays —
         a pytree, so outer-loop gradients flow through it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import Group
from .cost_function import CostFunction, GNCRobustCostFunction, RobustCostFunction


def _bcast(v, shape):
    """Broadcast that keeps host (numpy) values host-side (a view, no op)."""
    if isinstance(v, np.ndarray):
        return np.broadcast_to(v, shape)
    return jnp.broadcast_to(v, shape)


def _stack(arrs, axis=0):
    """Stack that keeps all-host inputs in numpy: an eager jnp.stack of N
    device operands is an N-operand compile + dispatch per call on a remote
    backend. Mixed/device inputs take the jnp path (differentiable)."""
    if all(isinstance(a, np.ndarray) for a in arrs):
        return np.stack(arrs, axis=axis)
    return jnp.stack([jnp.asarray(a) for a in arrs], axis=axis)


@dataclasses.dataclass(frozen=True)
class SlotSpec:
    type_key: str
    dof: int
    idx: np.ndarray  # (K,) member index within the type stack
    cols: np.ndarray  # (K, dof) global tangent column indices
    shared: bool  # all instances reference the same variable


@dataclasses.dataclass(frozen=True)
class AuxSlotSpec:
    names: Tuple[str, ...]
    shared: bool
    # stacked=True: the single name refers to a pre-stacked (K, B, ...)
    # array (CostFamily bulk path) — no per-member jnp.stack at build_aux
    stacked: bool = False


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    name: str
    template: CostFunction
    cfs: Tuple[CostFunction, ...]
    dim: int
    row_offset: int
    optim_slots: Tuple[SlotSpec, ...]
    aux_slots: Tuple[AuxSlotSpec, ...]
    weight_slots: Tuple[AuxSlotSpec, ...]
    robust: bool
    gnc: bool
    # CostFamily buckets carry no per-member cfs; instance count is explicit
    count: Optional[int] = None

    @property
    def k(self) -> int:
        return self.count if self.count is not None else len(self.cfs)

    @property
    def rows(self) -> int:
        return self.k * self.dim


class CompiledObjective:
    """Pure-function view of an Objective. All index arrays are static."""

    def __init__(
        self,
        var_names: Sequence[str],
        var_groups: Dict[str, Group],
        buckets: Sequence[BucketSpec],
        type_members: Dict[str, Tuple[str, ...]],
        aux_defaults: Dict[str, jnp.ndarray],
        optim_defaults: Dict[str, jnp.ndarray],
        dtype=jnp.float32,
        families: Optional[Dict[str, "object"]] = None,
        type_segments: Optional[Dict[str, list]] = None,
    ):
        self.var_names = tuple(var_names)
        self.var_groups = dict(var_groups)
        self.buckets = tuple(buckets)
        self.type_members = dict(type_members)
        self.aux_defaults = dict(aux_defaults)
        self.optim_defaults = dict(optim_defaults)
        self.dtype = dtype
        # bulk path: families maps family name -> VariableFamily;
        # type_segments maps type_key -> list of ("vars", [names]) |
        # ("fam", family) runs, concatenated in order to form the type stack
        self.families = dict(families or {})
        self.type_segments = type_segments
        # names whose value arrays are (N, B, ...) stacked — batch at axis 1
        self.stacked_names = set(self.families)
        for bk in self.buckets:
            for s in list(bk.aux_slots) + list(bk.weight_slots):
                if s.stacked:
                    self.stacked_names.add(s.names[0])

        self.col_offset: Dict[str, int] = {}
        off = 0
        for n in self.var_names:
            self.col_offset[n] = off
            off += self.var_groups[n].dof
        self.total_dof = off
        self.total_dim = sum(b.rows for b in self.buckets)

        self.groups_by_type: Dict[str, Group] = {}
        for n in self.var_names:
            self.groups_by_type[self.var_groups[n].name] = self.var_groups[n]

        # per-type static col matrices and member order
        self.type_cols: Dict[str, np.ndarray] = {}
        self.type_index: Dict[str, int] = {}
        for tk, members in self.type_members.items():
            g = self.groups_by_type[tk]
            self.type_cols[tk] = np.stack(
                [
                    np.arange(self.col_offset[n], self.col_offset[n] + g.dof)
                    for n in members
                ]
            )
            for i, n in enumerate(members):
                self.type_index[n] = i

    # ------------------------------------------------------------------
    def resolve_batch_size(self, values: Dict[str, jnp.ndarray]) -> int:
        """Max leading dim; 1-batches broadcast (reference objective.py:708).
        Family values carry batch at axis 1 ((N, B, ...) layout)."""
        b = 1
        for k, v in values.items():
            ax = 1 if k in self.stacked_names else 0
            if v.ndim > ax:
                b = max(b, int(v.shape[ax]))
        return b

    def pack(self, values: Dict[str, jnp.ndarray], batch_size: Optional[int] = None):
        """values {name: (B|1, *shape)} (+ {family: (N, B|1, *shape)}) ->
        state {type: (N_t, B, *shape)}. Family blocks enter as single
        operands — no N-way stack. Host (numpy) values stay host-side and
        stack in numpy: an eager jnp.stack of N device operands is an
        N-operand remote compile+dispatch per call (a 2500-pose pack cost
        tens of seconds through the tunnel); the single host array moves to
        the device once, at the first jitted call."""
        b = batch_size or self.resolve_batch_size(values)
        state = {}
        for tk, segs in self._segments(tk_filter=None).items():
            pieces = []
            for kind, obj in segs:
                if kind == "vars":
                    arrs = []
                    for n in obj:
                        v = values[n]
                        if v.shape[0] != b:
                            v = _bcast(v, (b,) + v.shape[1:])
                        arrs.append(v)
                    pieces.append(_stack(arrs))
                else:
                    fam = obj
                    v = values[fam.name]
                    if not isinstance(v, (np.ndarray, jnp.ndarray)):
                        v = jnp.asarray(v)
                    if v.shape[1] != b:
                        v = jnp.broadcast_to(v, (v.shape[0], b) + v.shape[2:])
                    pieces.append(v)
            state[tk] = (
                pieces[0]
                if len(pieces) == 1
                else (
                    np.concatenate(pieces, axis=0)
                    if all(isinstance(p, np.ndarray) for p in pieces)
                    else jnp.concatenate(
                        [jnp.asarray(p) for p in pieces], axis=0
                    )
                )
            )
        return state

    def _segments(self, tk_filter=None) -> Dict[str, list]:
        """type_key -> run-length segments; falls back to one all-names run."""
        if self.type_segments is not None:
            return self.type_segments
        return {
            tk: [("vars", list(members))]
            for tk, members in self.type_members.items()
        }

    def unpack(self, state) -> Dict[str, jnp.ndarray]:
        """state -> {individual name: (B, ...)} + {family name: (N, B, ...)}."""
        out = {}
        for tk, segs in self._segments().items():
            off = 0
            for kind, obj in segs:
                if kind == "vars":
                    for n in obj:
                        out[n] = state[tk][off]
                        off += 1
                else:
                    fam = obj
                    out[fam.name] = state[tk][off : off + fam.count]
                    off += fam.count
        return out

    def build_aux(self, values: Dict[str, jnp.ndarray], batch_size: Optional[int] = None):
        """Gather per-bucket stacked aux arrays (a differentiable pytree)."""
        b = batch_size or self.resolve_batch_size(values)

        def cast(v):
            # pin floating aux to the objective dtype: numpy-default f64
            # values (e.g. weight defaults) must not leak f64 into the
            # compiled program when the process runs with x64 enabled —
            # Mosaic kernels reject 64-bit operands and the reference
            # likewise coerces aux to the objective dtype
            if jnp.issubdtype(v.dtype, jnp.floating) and v.dtype != self.dtype:
                return v.astype(self.dtype)
            return v

        def get(n):
            v = values[n] if n in values else self.aux_defaults[n]
            if v.shape[0] != b:
                v = _bcast(v, (b,) + v.shape[1:])
            return cast(v)

        def get_stacked(n):
            """Pre-stacked (K, B|1, ...) array; broadcast batch at axis 1."""
            v = values[n] if n in values else self.aux_defaults[n]
            if not isinstance(v, (np.ndarray, jnp.ndarray)):
                v = jnp.asarray(v)
            if v.ndim >= 2 and v.shape[1] != b:
                v = _bcast(v, (v.shape[0], b) + v.shape[2:])
            return cast(v)

        def build_slots(slots):
            out = []
            for s in slots:
                if s.stacked:
                    out.append(get_stacked(s.names[0]))  # (K, B, ...)
                elif s.shared:
                    out.append(get(s.names[0]))  # (B, ...)
                else:
                    out.append(_stack([get(n) for n in s.names], axis=0))
            return tuple(out)

        return tuple(
            (build_slots(bk.aux_slots), build_slots(bk.weight_slots))
            for bk in self.buckets
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _mask_zero_weights(weight, w_aux, werr, wjacs=None):
        """Where-mask contributions of zero weights (reference is_zero +
        masked_jacobians skip, theseus/core/cost_function.py:104-116): with
        static TPU shapes we cannot drop rows, but the mask guarantees a
        zero weight contributes exactly 0 even for NaN/inf residuals."""
        zmask = weight.is_zero(w_aux)
        if zmask is None:
            return werr, wjacs
        werr = jnp.where(zmask[..., None], jnp.zeros_like(werr), werr)
        if wjacs is not None:
            wjacs = [
                jnp.where(zmask[..., None, None], jnp.zeros_like(j), j)
                for j in wjacs
            ]
        return werr, wjacs

    @staticmethod
    def _guard_zero_weight_metric(weight, w_aux, werr):
        """Metric-path guard: zero out entries that are BOTH zero-weight and
        non-finite. Unlike the linearize mask, finite values pass through
        untouched, preserving the reference's weighted_error gradient
        semantics (a weight at exactly 0 still sees d(w*e)/dw = e); only
        NaN/inf residuals hiding behind a zero weight are suppressed so they
        cannot poison the error metric / step acceptance."""
        zmask = weight.is_zero(w_aux)
        if zmask is None:
            return werr
        bad = zmask[..., None] & ~jnp.isfinite(werr)
        return jnp.where(bad, jnp.zeros_like(werr), werr)

    def _bucket_eval(self, bucket: BucketSpec, state, bucket_aux, mode: str):
        """mode: 'metric' -> weighted (robust-transformed) error only;
        'linearize' -> (jacs, rescaled err)."""
        cf_aux, w_aux = bucket_aux
        xs = tuple(state[s.type_key][np.asarray(s.idx)] for s in bucket.optim_slots)
        template = bucket.template
        weight = template.weight

        n_optim = len(xs)
        n_aux = len(cf_aux)

        if mode == "metric":
            fused = getattr(template, "fused_error", None)
            if fused is not None and not bucket.robust:
                err = fused(xs, cf_aux)
                if err is not None:
                    w_applied = weight.apply_batched(err, None, w_aux)
                    if w_applied is not None and w_applied[0] is not None:
                        return self._guard_zero_weight_metric(
                            weight, w_aux, w_applied[0]
                        )

            def one(args):
                optim = args[:n_optim]
                aux = args[n_optim : n_optim + n_aux]
                waux = args[n_optim + n_aux :]
                err = template.error_impl(optim, aux)
                werr, _ = weight.apply(err, None, waux)
                if bucket.robust:
                    if bucket.gnc:
                        log_radius, mu = aux[-2][..., 0], aux[-1][..., 0]
                    else:
                        log_radius, mu = aux[-1][..., 0], None
                    werr = template.robust_apply_error(werr, log_radius, mu)
                return werr

        else:
            # whole-bucket fused kernels (e.g. Pallas SE3 Between): bypass
            # the per-instance vmap when the template offers one and the
            # weight supports batched application
            fused = getattr(template, "fused_linearize", None)
            if fused is not None and not bucket.robust:
                xs_b = xs
                out = fused(xs_b, cf_aux)
                if out is not None:
                    jacs, err = out
                    w_applied = weight.apply_batched(err, list(jacs), w_aux)
                    if w_applied is not None and w_applied[0] is not None:
                        werr, wjacs = w_applied
                        werr, wjacs = self._mask_zero_weights(weight, w_aux, werr, wjacs)
                        return tuple(wjacs), werr

            jfn = template.jacobians_fn()

            def one(args):
                optim = args[:n_optim]
                aux = args[n_optim : n_optim + n_aux]
                waux = args[n_optim + n_aux :]
                jacs, err = jfn(optim, aux)
                werr, wjacs = weight.apply(err, jacs, waux)
                if bucket.robust:
                    if bucket.gnc:
                        log_radius, mu = aux[-2][..., 0], aux[-1][..., 0]
                    else:
                        log_radius, mu = aux[-1][..., 0], None
                    rescale = template.robust_rescale(werr, log_radius, mu)
                    if template.flatten_dims:
                        werr = rescale * werr
                        wjacs = [rescale[:, None] * j for j in wjacs]
                    else:
                        werr = rescale * werr
                        wjacs = [rescale * j for j in wjacs]
                return tuple(wjacs), werr

        args = xs + cf_aux + tuple(w_aux)
        outer_axes = tuple(
            [0] * n_optim
            + [None if s.shared else 0 for s in bucket.aux_slots]
            + [None if s.shared else 0 for s in bucket.weight_slots]
        )
        inner = jax.vmap(one, in_axes=((0,) * len(args),))
        outer = jax.vmap(inner, in_axes=(outer_axes,))
        out = outer(args)
        if mode == "metric":
            # finite values are NOT masked: mirrors the reference, where only
            # the linearization path skips zero weights
            # (weighted_jacobians_error, cost_function.py:106-121) while
            # weighted_error keeps the raw product — so outer-loop gradients
            # w.r.t. a weight parameter at exactly 0 still flow. Only
            # non-finite residuals behind a zero weight are zeroed.
            return self._guard_zero_weight_metric(weight, w_aux, out)
        wjacs, werr = out
        werr, wjacs = self._mask_zero_weights(weight, w_aux, werr, list(wjacs))
        return tuple(wjacs), werr

    def error(self, state, aux, mode: str = "metric"):
        """Weighted error vector (B, total_dim)."""
        outs = []
        for bk, bk_aux in zip(self.buckets, aux):
            if mode == "metric":
                werr = self._bucket_eval(bk, state, bk_aux, "metric")  # (K,B,dim)
            else:
                _, werr = self._bucket_eval(bk, state, bk_aux, "linearize")
            b = werr.shape[1]
            outs.append(jnp.moveaxis(werr, 0, 1).reshape(b, -1))
        return jnp.concatenate(outs, axis=-1)

    def error_metric(self, state, aux):
        """0.5 * ||e||^2 per batch element (reference objective.py:37)."""
        e = self.error(state, aux, mode="metric")
        return 0.5 * jnp.sum(e * e, axis=-1)

    def linearize_blocks(self, state, aux):
        """Per-bucket ((jacs per slot (K,B,dim,dof)), err (K,B,dim))."""
        return [
            self._bucket_eval(bk, state, bk_aux, "linearize")
            for bk, bk_aux in zip(self.buckets, aux)
        ]

    def dense_A_b(self, state, aux):
        """Assemble batched dense A (B, M, D) and b = -err (B, M)."""
        blocks = self.linearize_blocks(state, aux)
        some = next(iter(state.values()))
        b = some.shape[1]
        dtype = some.dtype
        A = jnp.zeros((b, self.total_dim, self.total_dof), dtype=dtype)
        errs = []
        for bk, (jacs, werr) in zip(self.buckets, blocks):
            rows = bk.row_offset + np.arange(bk.rows).reshape(bk.k, bk.dim)
            for s, jac in zip(bk.optim_slots, jacs):
                jac_t = jnp.moveaxis(jac, 0, 1)  # (B, K, dim, dof)
                A = A.at[:, rows[:, :, None], s.cols[:, None, :]].add(jac_t)
            errs.append(jnp.moveaxis(werr, 0, 1).reshape(b, -1))
        err = jnp.concatenate(errs, axis=-1)
        return A, -err

    # ------------------------------------------------------------------
    def retract(self, state, delta, accept=None):
        """state + delta (B, D), optionally masked per batch element.

        accept: (B,) bool; False freezes that batch element (the reference's
        batch_ignore_mask path, core/variable.py:65-71)."""
        new_state = {}
        for tk, members in self.type_members.items():
            g = self.groups_by_type[tk]
            cols = self.type_cols[tk]  # (N_t, dof)
            d = jnp.moveaxis(delta[:, cols], 0, 1)  # (N_t, B, dof)
            cur = state[tk]
            new = jax.vmap(jax.vmap(g.retract))(cur, d)
            if accept is not None:
                mask = accept.reshape((1, -1) + (1,) * (new.ndim - 2))
                new = jnp.where(mask, new, cur)
            new_state[tk] = new
        return new_state

    def state_dtype(self, state):
        return next(iter(state.values())).dtype

    def batch_size(self, state):
        return next(iter(state.values())).shape[1]

    # -- raw-coordinate flattening (for sampling-based optimizers) -------
    @property
    def total_raw_dim(self) -> int:
        return sum(
            int(np.prod(self.var_groups[n].shape)) for n in self.var_names
        )

    def flatten_raw(self, state):
        """state -> (B, total_raw_dim), vars in insertion order."""
        b = self.batch_size(state)
        parts = []
        for n in self.var_names:
            g = self.var_groups[n]
            arr = state[g.name][self.type_index[n]]  # (B, *shape)
            parts.append(arr.reshape(b, -1))
        return jnp.concatenate(parts, axis=-1)

    def unflatten_raw(self, vec):
        """(B, total_raw_dim) -> state (no manifold projection applied)."""
        b = vec.shape[0]
        per_type: Dict[str, list] = {tk: [None] * len(ms) for tk, ms in self.type_members.items()}
        off = 0
        for n in self.var_names:
            g = self.var_groups[n]
            size = int(np.prod(g.shape))
            arr = vec[:, off : off + size].reshape((b,) + tuple(g.shape))
            per_type[g.name][self.type_index[n]] = arr
            off += size
        return {tk: jnp.stack(arrs, axis=0) for tk, arrs in per_type.items()}


def _family_bucket(fam_cf, bucket_i, row_offset, type_index, col_offset):
    """One BucketSpec from a CostFamily — vectorized index construction."""
    from .cost_function import GNCRobustCostFunction, RobustCostFunction

    template = fam_cf.template
    count = fam_cf.count
    optim_slots = []
    for si, m in enumerate(fam_cf.members):
        if isinstance(m, tuple):
            fam, idx = m
            g = fam.group
            base_t = type_index[fam.member_name(0)]
            base_c = col_offset[fam.member_name(0)]
            sidx = base_t + idx
            cols = base_c + idx[:, None] * g.dof + np.arange(g.dof)[None, :]
            shared = False
        else:
            g = m.group
            sidx = np.full(count, type_index[m.name], dtype=np.int32)
            c0 = col_offset[m.name]
            cols = np.broadcast_to(
                c0 + np.arange(g.dof)[None, :], (count, g.dof)
            ).copy()
            shared = True
        optim_slots.append(
            SlotSpec(type_key=g.name, dof=g.dof, idx=sidx, cols=cols,
                     shared=shared)
        )

    def slots_for(avars):
        out = []
        for a in avars:
            stacked = fam_cf.aux_is_stacked(a)
            out.append(
                AuxSlotSpec(names=(a.name,), shared=not stacked,
                            stacked=stacked)
            )
        return tuple(out)

    return BucketSpec(
        name=f"bucket_{bucket_i}_{fam_cf.name}",
        template=template,
        cfs=(),
        count=count,
        dim=template.dim(),
        row_offset=row_offset,
        optim_slots=tuple(optim_slots),
        aux_slots=slots_for(template.aux_vars),
        weight_slots=slots_for(template.weight.aux_vars),
        robust=isinstance(template, RobustCostFunction),
        gnc=isinstance(template, GNCRobustCostFunction),
    )


def compile_objective(objective, vectorize: bool = True) -> CompiledObjective:
    """Bucket cost functions by schema and freeze all index arrays.

    vectorize=False gives every cost function its own single-member bucket —
    the analog of running the reference without Vectorize
    (theseus/core/vectorizer.py; evaluations/vectorization_ablation.sh) for
    ablation studies. Semantics are identical; only the batching changes.
    CostFamily entries (bulk construction) always form one bucket each."""
    from .family import CostFamily, VariableFamily

    cfs = list(objective.cost_functions.values())
    if not cfs:
        raise ValueError("Objective has no cost functions.")

    # optim var registry, insertion order; family members register the whole
    # family as one contiguous run
    var_entries: List[Tuple[str, object]] = []  # ("var", name)|("fam", family)
    var_groups: Dict[str, Group] = {}
    families: Dict[str, VariableFamily] = {}
    optim_defaults = {}
    aux_defaults = {}

    def reg_family(fam: VariableFamily):
        if fam.name in families:
            return
        if fam.name in var_groups:
            raise ValueError(f"Name clash: {fam.name} is already a variable.")
        families[fam.name] = fam
        var_entries.append(("fam", fam))
        for i in range(fam.count):
            var_groups[fam.member_name(i)] = fam.group
        if fam.tensor is not None:
            optim_defaults[fam.name] = fam.tensor

    def reg_var(v):
        fam = getattr(v, "family", None)
        if fam is not None:
            reg_family(fam)
            return
        if v.name not in var_groups:
            var_entries.append(("var", v.name))
            var_groups[v.name] = v.group
            if v.tensor is not None:
                optim_defaults[v.name] = v.tensor
        elif var_groups[v.name] is not v.group and var_groups[v.name] != v.group:
            raise ValueError(f"Variable {v.name} registered with two groups.")

    for cf in cfs:
        if isinstance(cf, CostFamily):
            for m in cf.members:
                if isinstance(m, tuple):
                    reg_family(m[0])
                else:
                    reg_var(m)
            for a in list(cf.template.aux_vars) + list(cf.template.weight.aux_vars):
                if a.tensor is not None and a.name not in aux_defaults:
                    aux_defaults[a.name] = a.tensor
            continue
        for v in cf.optim_vars:
            reg_var(v)
        for a in list(cf.aux_vars) + list(cf.weight.aux_vars):
            if a.tensor is not None and a.name not in aux_defaults:
                aux_defaults[a.name] = a.tensor

    # expanded member-name list (tangent layout order)
    var_names: List[str] = []
    for kind, obj in var_entries:
        if kind == "var":
            var_names.append(obj)
        else:
            var_names.extend(obj.member_name(i) for i in range(obj.count))

    # type stacks: per type, runs of individual vars / family blocks in
    # registration order; expanded type_members kept for downstream code
    type_segments: Dict[str, list] = {}
    type_members_l: Dict[str, List[str]] = {}
    for kind, obj in var_entries:
        if kind == "var":
            tk = var_groups[obj].name
            segs = type_segments.setdefault(tk, [])
            if segs and segs[-1][0] == "vars":
                segs[-1][1].append(obj)
            else:
                segs.append(("vars", [obj]))
            type_members_l.setdefault(tk, []).append(obj)
        else:
            tk = obj.group.name
            type_segments.setdefault(tk, []).append(("fam", obj))
            type_members_l.setdefault(tk, []).extend(
                obj.member_name(i) for i in range(obj.count)
            )
    type_members: Dict[str, Tuple[str, ...]] = {
        tk: tuple(ms) for tk, ms in type_members_l.items()
    }
    type_index = {n: i for ms in type_members.values() for i, n in enumerate(ms)}

    dtype = None
    for t in list(optim_defaults.values()) + list(aux_defaults.values()):
        if jnp.issubdtype(t.dtype, jnp.floating):
            dtype = t.dtype
            break
    dtype = dtype or jnp.float32

    # schema bucketing, preserving insertion order of first member;
    # CostFamily entries are always their own (pre-fused) bucket
    bucket_map: Dict = {}
    order: List = []
    for cf in cfs:
        if isinstance(cf, CostFamily):
            key = ("__family__", cf.name)
        else:
            key = cf.schema() if vectorize else (cf.schema(), cf.name)
        if key not in bucket_map:
            bucket_map[key] = []
            order.append(key)
        bucket_map[key].append(cf)

    col_offset = {}
    off = 0
    for n in var_names:
        col_offset[n] = off
        off += var_groups[n].dof

    buckets: List[BucketSpec] = []
    row_offset = 0
    for key in order:
        members = bucket_map[key]
        t0 = members[0]
        if isinstance(t0, CostFamily):
            bk = _family_bucket(
                t0, len(buckets), row_offset, type_index, col_offset
            )
            buckets.append(bk)
            row_offset += bk.rows
            continue
        optim_slots = []
        for si, v in enumerate(t0.optim_vars):
            g = v.group
            names = [cf.optim_vars[si].name for cf in members]
            idx = np.array([type_index[n] for n in names])
            cols = np.stack(
                [np.arange(col_offset[n], col_offset[n] + g.dof) for n in names]
            )
            optim_slots.append(
                SlotSpec(
                    type_key=g.name,
                    dof=g.dof,
                    idx=idx,
                    cols=cols,
                    shared=len(set(names)) == 1,
                )
            )
        aux_slots = []
        for si in range(len(t0.aux_vars)):
            names = tuple(cf.aux_vars[si].name for cf in members)
            aux_slots.append(AuxSlotSpec(names=names, shared=len(set(names)) == 1))
        weight_slots = []
        for si in range(len(t0.weight.aux_vars)):
            names = tuple(cf.weight.aux_vars[si].name for cf in members)
            weight_slots.append(AuxSlotSpec(names=names, shared=len(set(names)) == 1))

        robust = isinstance(t0, RobustCostFunction)
        buckets.append(
            BucketSpec(
                name=f"bucket_{len(buckets)}_{type(t0).__name__}",
                template=t0,
                cfs=tuple(members),
                dim=t0.dim(),
                row_offset=row_offset,
                optim_slots=tuple(optim_slots),
                aux_slots=tuple(aux_slots),
                weight_slots=tuple(weight_slots),
                robust=robust,
                gnc=isinstance(t0, GNCRobustCostFunction),
            )
        )
        row_offset += len(members) * t0.dim()

    return CompiledObjective(
        var_names=var_names,
        var_groups=var_groups,
        buckets=buckets,
        type_members=type_members,
        aux_defaults=aux_defaults,
        optim_defaults=optim_defaults,
        dtype=dtype,
        families=families,
        type_segments=type_segments,
    )
