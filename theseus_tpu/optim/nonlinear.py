"""Batched second-order inner-loop optimizers as jitted masked loops.

Re-design of the reference NonlinearOptimizer hierarchy
(theseus/optimizer/nonlinear/nonlinear_optimizer.py:87,
nonlinear_least_squares.py:57): the Python `while` with data-dependent
control flow becomes a `lax.while_loop` (no-grad phases, early exit when all
batch elements converge) or a fixed-length `lax.scan` (differentiable
phases), with all per-batch-element logic (convergence, LM accept/reject,
step rejection freezing) expressed as masks — the functional analog of the
reference's `batch_ignore_mask` machinery (core/variable.py:65-71).

One deliberate deviation from the reference: a batch element whose LM step
was rejected is never marked converged on that iteration (the reference's
per-element path can mark `err_change == 0` rejects as converged,
nonlinear_optimizer.py:110-119; only all-reject iterations get a retry).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import solver_precision
from ..core.compiled import CompiledObjective
from .linear import DenseCholeskySolver, damping_diag
from .normal import DenseNormalBuilder, SparseNormalBuilder


class NonlinearOptimizerStatus:
    START = 0
    CONVERGED = 1
    MAX_ITERATIONS = 2
    FAIL = -1


class OptimizerInfo(NamedTuple):
    """Per-batch-element solve diagnostics (reference optimizer.py:20,
    nonlinear_optimizer.py:59-75)."""

    status: jnp.ndarray  # (B,) int8
    converged_iter: jnp.ndarray  # (B,) int32
    best_err: jnp.ndarray  # (B,)
    last_err: jnp.ndarray  # (B,)
    err_history: Optional[jnp.ndarray] = None  # (max_iter+1, B)
    state_history: Optional[Any] = None  # optional pytree history


@dataclasses.dataclass(frozen=True)
class NLSOptions:
    """Static solve options (hashable; part of the jit cache key)."""

    max_iterations: int = 20
    step_size: float = 1.0
    abs_err_tolerance: float = 1e-10
    rel_err_tolerance: float = 1e-8
    damping: float = 0.001
    adaptive_damping: bool = False
    ellipsoidal_damping: bool = False
    damping_eps: float = 1e-8
    down_damping_ratio: float = 9.0
    up_damping_ratio: float = 11.0
    damping_accept: float = 0.1
    min_damping: float = 1e-7
    max_damping: float = 1e7
    track_err_history: bool = True
    track_state_history: bool = False
    verbose: bool = False
    # trust-region options (Dogleg; reference trust_region.py:113-135)
    trust_region_init: float = 0.5
    accept_threshold: float = 0.0
    shrink_threshold: float = 0.25
    expand_threshold: float = 0.75
    shrink_ratio: float = 0.25
    expand_ratio: float = 2.0
    min_trust_region: float = 1e-5
    max_trust_region: float = 1e5


class NonlinearLeastSquares:
    """Base for GN/LM/Dogleg. Holds the objective + linear solver and exposes
    pure `init_carry`/`iteration`/`run_*` building blocks that the layer
    composes into backward modes."""

    method = "base"
    # backward modes usable through TheseusLayer (derivative-free subclasses
    # narrow this; reference: DCEM has no linearization, dcem.py:26)
    supported_modes = ("unroll", "implicit", "truncated", "dlm")

    def __init__(
        self,
        objective,
        linear_solver=None,
        linearization: str = "dense",
        ordering: str = "auto",
        max_iterations: int = 20,
        step_size: float = 1.0,
        abs_err_tolerance: float = 1e-10,
        rel_err_tolerance: float = 1e-8,
        **opt_kwargs,
    ):
        if linearization not in ("dense", "sparse", "schur"):
            raise ValueError("linearization must be 'dense', 'sparse' or 'schur'")
        self.objective = objective
        self.linear_solver = linear_solver or DenseCholeskySolver()
        self.linearization = linearization
        self.ordering = ordering
        self.eliminate = opt_kwargs.pop("eliminate", None)
        self.sparse_solver = opt_kwargs.pop("sparse_solver", "direct")
        self.pcg_iters = opt_kwargs.pop("pcg_iters", 100)
        # per-iteration host callback (reference nonlinear_optimizer.py:77):
        # called as cb(optimizer, err (B,), delta (B, D), iteration)
        self.end_iter_callback = opt_kwargs.pop("end_iter_callback", None)
        self._normal_builder = None
        self._jit_cache = {}
        self.opts = NLSOptions(
            max_iterations=max_iterations,
            step_size=step_size,
            abs_err_tolerance=abs_err_tolerance,
            rel_err_tolerance=rel_err_tolerance,
            **opt_kwargs,
        )

    @property
    def compiled(self) -> CompiledObjective:
        return self.objective.compile()

    @property
    def normal_builder(self):
        # invalidate on structural recompiles
        co = self.compiled
        if self._normal_builder is None or self._normal_builder.co is not co:
            if self.linearization == "sparse":
                self._normal_builder = SparseNormalBuilder(
                    co, ordering=self.ordering, solver=self.sparse_solver,
                    pcg_iters=self.pcg_iters,
                )
            elif self.linearization == "schur":
                from .schur import SchurNormalBuilder, eliminate_points

                self._normal_builder = SchurNormalBuilder(
                    co, self.eliminate or eliminate_points
                )
            else:
                self._normal_builder = DenseNormalBuilder(co, self.linear_solver)
        return self._normal_builder

    def _init_scalar_state(self, opts: NLSOptions) -> float:
        """Per-batch scalar state: LM damping or trust radius."""
        return opts.damping

    # -- pure building blocks -------------------------------------------
    def init_carry(self, state, aux, opts: NLSOptions, batch_ignore_mask=None):
        """batch_ignore_mask: optional (B,) bool; True freezes that batch
        element for the whole solve (the reference's user-facing
        batch_ignore_mask, core/variable.py:65-71, objective.py:729)."""
        co = self.compiled
        b = co.batch_size(state)
        dtype = co.state_dtype(state)
        with solver_precision():
            err = co.error_metric(state, aux)
        ignore = (
            jnp.zeros((b,), dtype=bool)
            if batch_ignore_mask is None
            else jnp.asarray(batch_ignore_mask, dtype=bool)
        )
        carry = {
            "state": state,
            "err": err,
            "done": ignore,  # frozen elements never update
            "ignore": ignore,
            "fail": jnp.zeros((b,), dtype=bool),
            "damping": jnp.full((b,), self._init_scalar_state(opts), dtype=dtype),
            "it": jnp.zeros((), dtype=jnp.int32),
            "converged_iter": jnp.full((b,), -1, dtype=jnp.int32),
            "best_err": err,
        }
        if opts.track_err_history:
            hist = jnp.full((opts.max_iterations + 1, b), jnp.nan, dtype=dtype)
            carry["history"] = hist.at[0].set(err)
        if opts.track_state_history:
            # per-iteration variable state (reference
            # nonlinear_optimizer.py:131-176): (max_iter+1, N_t, B, *shape)
            carry["state_history"] = jax.tree_util.tree_map(
                lambda s: jnp.full(
                    (opts.max_iterations + 1,) + s.shape, jnp.nan, dtype=s.dtype
                ).at[0].set(s),
                state,
            )
        return carry

    def compute_delta(self, ns, damping, opts: NLSOptions):
        """Subclass hook: returns (delta, fail_mask) from a NormalSystem."""
        raise NotImplementedError

    def _accept_and_damping(self, delta, ns, new_err, prev_err, damping, opts):
        """Subclass hook: returns (accept_mask (B,), new_damping)."""
        b = new_err.shape[0]
        return jnp.ones((b,), dtype=bool), damping

    def iteration(self, carry, aux, opts: NLSOptions, detach_hessian=False, force_update=False, step_size=None):
        with solver_precision():
            return self._iteration_inner(
                carry, aux, opts, detach_hessian, force_update, step_size
            )

    def _iteration_inner(self, carry, aux, opts: NLSOptions, detach_hessian=False, force_update=False, step_size=None):
        co = self.compiled
        state = carry["state"]
        ns = self.normal_builder.build(state, aux, detach_hessian)
        delta, solver_fail = self.compute_delta(ns, carry["damping"], opts)
        ss = opts.step_size if step_size is None else step_size
        tentative = co.retract(state, ss * delta)
        new_err = co.error_metric(tentative, aux)

        if force_update:
            accept = jnp.ones_like(carry["done"])
            damping = carry["damping"]
        else:
            accept, damping = self._accept_and_damping(
                delta, ns, new_err, carry["err"], carry["damping"], opts
            )
        bad = solver_fail | ~jnp.isfinite(new_err)
        active = ~carry["done"] & ~bad
        do_update = accept & active

        mask = do_update
        new_state = {}
        for tk in state:
            m = mask.reshape((1, -1) + (1,) * (state[tk].ndim - 2))
            new_state[tk] = jnp.where(m, tentative[tk], state[tk])
        err = jnp.where(do_update, new_err, carry["err"])

        # convergence (reference nonlinear_optimizer.py:110-119, amended so
        # rejected steps don't count as converged)
        all_small = jnp.mean(jnp.abs(err)) < opts.abs_err_tolerance
        change = carry["err"] - err
        denom = jnp.where(carry["err"] == 0, 1.0, carry["err"])
        conv = (jnp.abs(change) < opts.abs_err_tolerance) | (
            jnp.abs(change / denom) < opts.rel_err_tolerance
        )
        newly_converged = (conv & do_update) | all_small
        it = carry["it"] + 1
        converged_iter = jnp.where(
            newly_converged & (carry["converged_iter"] < 0) & ~carry["done"],
            it,
            carry["converged_iter"],
        )
        done = carry["done"] | newly_converged
        fail = carry["fail"] | (bad & ~carry["done"])

        if opts.verbose:
            jax.debug.print(
                "Nonlinear optimizer. Iteration: {it}. Error: {err}",
                it=it, err=jnp.mean(err),
            )
        if self.end_iter_callback is not None:
            cb = self.end_iter_callback
            jax.debug.callback(
                lambda e, d, i: cb(self, e, d, int(i)), err, delta, it
            )

        out = {
            "state": new_state,
            "err": err,
            "done": done,
            "ignore": carry["ignore"],
            "fail": fail,
            "damping": damping,
            "it": it,
            "converged_iter": converged_iter,
            "best_err": jnp.minimum(carry["best_err"], err),
        }
        if "history" in carry:
            out["history"] = carry["history"].at[it].set(err)
        if "state_history" in carry:
            out["state_history"] = jax.tree_util.tree_map(
                lambda h, s: h.at[it].set(s), carry["state_history"], new_state
            )
        return out

    def run_scan(self, carry, aux, num_iters: int, opts: NLSOptions):
        """Fixed-length differentiable loop (masked; no early exit)."""
        if num_iters <= 0:
            return carry

        def body(c, _):
            return self.iteration(c, aux, opts), None

        carry, _ = jax.lax.scan(body, carry, None, length=num_iters)
        return carry

    def run_while(self, carry, aux, max_iters: int, opts: NLSOptions):
        """Early-exit loop for no-grad phases."""
        if max_iters <= 0:
            return carry
        start_it = carry["it"]

        def cond(c):
            return (c["it"] - start_it < max_iters) & ~jnp.all(c["done"] | c["fail"])

        def body(c):
            return self.iteration(c, aux, opts)

        return jax.lax.while_loop(cond, body, carry)

    def make_info(self, carry, opts: NLSOptions) -> OptimizerInfo:
        status = jnp.where(
            carry["fail"],
            NonlinearOptimizerStatus.FAIL,
            jnp.where(
                carry["done"],
                NonlinearOptimizerStatus.CONVERGED,
                NonlinearOptimizerStatus.MAX_ITERATIONS,
            ),
        ).astype(jnp.int8)
        ignore = carry.get("ignore")
        if ignore is not None:
            status = jnp.where(
                ignore, jnp.int8(NonlinearOptimizerStatus.START), status
            )
        return OptimizerInfo(
            status=status,
            converged_iter=carry["converged_iter"],
            best_err=carry["best_err"],
            last_err=carry["err"],
            err_history=carry.get("history"),
            state_history=carry.get("state_history"),
        )

    # -- user-facing solve (no outer grad bookkeeping; see layer.py) ----
    def optimize(self, values=None, input_tensors=None, verbose: bool = False,
                 batch_ignore_mask=None, **kwargs):
        """Convenience one-shot solve returning (values_dict, info)."""
        co = self.compiled
        values = values or self.objective.default_values(input_tensors)
        bsz = co.resolve_batch_size(values)
        state = co.pack(values, bsz)
        aux = co.build_aux(values, bsz)
        if verbose:
            kwargs["verbose"] = True
        opts = dataclasses.replace(self.opts, **kwargs) if kwargs else self.opts

        # jit cached per (compiled objective, opts) so repeated optimize()
        # calls don't retrace (round-1 re-jitted every call)
        cache_key = (co, opts)
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            def solve(state, aux, mask):
                with solver_precision():
                    carry = self.init_carry(state, aux, opts, mask)
                    carry = self.run_while(carry, aux, opts.max_iterations, opts)
                return carry

            from ..utils.hoist import hoist_jit

            fn = hoist_jit(solve)
            self._jit_cache[cache_key] = fn
        carry = fn(state, aux, batch_ignore_mask)
        info = self.make_info(carry, opts)
        out = dict(values)
        out.update(co.unpack(carry["state"]))
        return out, info


class GaussNewton(NonlinearLeastSquares):
    """delta = solve(AtA, Atb) (reference gauss_newton.py:17)."""

    method = "gauss_newton"

    def compute_delta(self, ns, damping, opts: NLSOptions):
        return ns.solve(0.0, False)


class LevenbergMarquardt(NonlinearLeastSquares):
    """Damped steps with optional per-batch adaptive damping
    (reference levenberg_marquardt.py:51)."""

    method = "levenberg_marquardt"

    def compute_delta(self, ns, damping, opts: NLSOptions):
        return ns.solve(damping, opts.ellipsoidal_damping)

    def _accept_and_damping(self, delta, ns, new_err, prev_err, damping, opts):
        if not opts.adaptive_damping:
            b = new_err.shape[0]
            return jnp.ones((b,), dtype=bool), damping
        # gain ratio rho = (prev - new) / (0.5 * delta . (damping*D*delta + Atb))
        # (reference levenberg_marquardt.py:173-201)
        dvec = damping_diag(ns.diag(), damping, opts.ellipsoidal_damping)
        den = 0.5 * jnp.sum(delta * (dvec * delta + ns.Atb), axis=-1)
        den = jnp.where(den == 0, 1e-12, den)
        rho = (prev_err - new_err) / den
        reject = rho <= opts.damping_accept
        new_damping = jnp.where(
            reject, damping * opts.up_damping_ratio, damping / opts.down_damping_ratio
        )
        new_damping = jnp.clip(new_damping, opts.min_damping, opts.max_damping)
        return ~reject, new_damping


class Dogleg(NonlinearLeastSquares):
    """Dogleg trust-region steps (reference dogleg.py:18, trust_region.py:35).

    The per-batch scalar state carried across iterations is the trust radius.
    Everything is computed from (AtA, Atb) so the same normal-equation path
    serves dense and sparse linearizations: ||A d||^2 = d^T AtA d."""

    method = "dogleg"
    EPS = 1e-7

    def _init_scalar_state(self, opts: NLSOptions) -> float:
        return opts.trust_region_init

    def compute_delta(self, ns, trust_region, opts: NLSOptions):
        delta_gn, fail = ns.solve(0.0, False)
        tr2 = (trust_region**2)[:, None]

        delta_sd = ns.Atb  # steepest descent direction (grad = -Atb)
        sd_AtA_sd = ns.quad(delta_sd)[:, None]
        grad_norm_2 = jnp.sum(delta_sd**2, axis=-1, keepdims=True)
        cauchy_step = grad_norm_2 / (sd_AtA_sd + Dogleg.EPS)
        delta_c = delta_sd * cauchy_step
        delta_c_norm_2 = grad_norm_2 * cauchy_step**2
        c_within = delta_c_norm_2 <= tr2

        # truncate Cauchy steps beyond the region
        delta_trunc = delta_c * trust_region[:, None] / jnp.sqrt(delta_c_norm_2 + Dogleg.EPS)

        # interpolate toward GN along the dogleg path: ||c + tau (gn - c)|| = tr
        diff = delta_gn - delta_c
        a = jnp.sum(diff**2, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(delta_c * diff, axis=-1, keepdims=True)
        c = delta_c_norm_2 - tr2
        disc = jnp.maximum(b**2 - 4.0 * a * c, Dogleg.EPS)
        tau = jnp.minimum((-b + jnp.sqrt(disc)) / (2.0 * a + Dogleg.EPS), 1.0)
        delta_interp = delta_c + tau * diff

        gn_norm_2 = jnp.sum(delta_gn**2, axis=-1, keepdims=True)
        gn_within = gn_norm_2 < tr2
        delta = jnp.where(gn_within, delta_gn, jnp.where(c_within, delta_interp, delta_trunc))
        return delta, fail

    def _accept_and_damping(self, delta, ns, new_err, prev_err, trust_region, opts):
        # rho = actual/predicted reduction (reference trust_region.py:91-113)
        Ad2 = ns.quad(delta)
        pred_err = prev_err - jnp.sum(delta * ns.Atb, axis=-1) + 0.5 * Ad2
        den = prev_err - pred_err
        den = jnp.where(den == 0, 1e-12, den)
        rho = (prev_err - new_err) / den
        tr = jnp.where(rho < opts.shrink_threshold, trust_region * opts.shrink_ratio, trust_region)
        tr = jnp.where(rho > opts.expand_threshold, tr * opts.expand_ratio, tr)
        tr = jnp.clip(tr, opts.min_trust_region, opts.max_trust_region)
        return rho >= opts.accept_threshold, tr


class LinearOptimizer(NonlinearLeastSquares):
    """Single linearize+solve+retract (reference optimizer/linear/
    linear_optimizer.py:25): for objectives that are exactly least squares."""

    method = "linear"

    def __init__(self, objective, **kwargs):
        kwargs.setdefault("max_iterations", 1)
        super().__init__(objective, **kwargs)

    def compute_delta(self, ns, damping, opts: NLSOptions):
        return ns.solve(0.0, False)
