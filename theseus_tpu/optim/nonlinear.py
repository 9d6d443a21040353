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

from ..core.compiled import CompiledObjective
from .linear import DenseCholeskySolver, damping_diag


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


class NonlinearLeastSquares:
    """Base for GN/LM/Dogleg. Holds the objective + linear solver and exposes
    pure `init_carry`/`iteration`/`run_*` building blocks that the layer
    composes into backward modes."""

    method = "base"

    def __init__(
        self,
        objective,
        linear_solver=None,
        linearization: str = "dense",
        max_iterations: int = 20,
        step_size: float = 1.0,
        abs_err_tolerance: float = 1e-10,
        rel_err_tolerance: float = 1e-8,
        **opt_kwargs,
    ):
        self.objective = objective
        self.linear_solver = linear_solver or DenseCholeskySolver()
        self.linearization = linearization
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

    # -- pure building blocks -------------------------------------------
    def init_carry(self, state, aux, opts: NLSOptions):
        co = self.compiled
        b = co.batch_size(state)
        dtype = co.state_dtype(state)
        err = co.error_metric(state, aux)
        carry = {
            "state": state,
            "err": err,
            "done": jnp.zeros((b,), dtype=bool),
            "fail": jnp.zeros((b,), dtype=bool),
            "damping": jnp.full((b,), opts.damping, dtype=dtype),
            "it": jnp.zeros((), dtype=jnp.int32),
            "converged_iter": jnp.full((b,), -1, dtype=jnp.int32),
            "best_err": err,
        }
        if opts.track_err_history:
            hist = jnp.full((opts.max_iterations + 1, b), jnp.nan, dtype=dtype)
            carry["history"] = hist.at[0].set(err)
        return carry

    def _normal_system(self, state, aux, detach_hessian: bool = False):
        """Returns (AtA (B,D,D), Atb (B,D)). Hessian optionally detached for
        the implicit-diff final step (reference dense_linearization.py:61)."""
        co = self.compiled
        A, b = co.dense_A_b(state, aux)
        A_h = jax.lax.stop_gradient(A) if detach_hessian else A
        AtA = jnp.einsum("bmi,bmj->bij", A_h, A_h)
        Atb = jnp.einsum("bmi,bm->bi", A, b)
        return AtA, Atb

    def compute_delta(self, AtA, Atb, damping, opts: NLSOptions):
        """Subclass hook: returns (delta, fail_mask)."""
        raise NotImplementedError

    def _accept_and_damping(self, delta, AtA, Atb, new_err, prev_err, damping, opts):
        """Subclass hook: returns (accept_mask (B,), new_damping)."""
        b = new_err.shape[0]
        return jnp.ones((b,), dtype=bool), damping

    def iteration(self, carry, aux, opts: NLSOptions, detach_hessian=False, force_update=False, step_size=None):
        co = self.compiled
        state = carry["state"]
        AtA, Atb = self._normal_system(state, aux, detach_hessian)
        delta, solver_fail = self.compute_delta(AtA, Atb, carry["damping"], opts)
        ss = opts.step_size if step_size is None else step_size
        tentative = co.retract(state, ss * delta)
        new_err = co.error_metric(tentative, aux)

        if force_update:
            accept = jnp.ones_like(carry["done"])
            damping = carry["damping"]
        else:
            accept, damping = self._accept_and_damping(
                delta, AtA, Atb, new_err, carry["err"], carry["damping"], opts
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

        out = {
            "state": new_state,
            "err": err,
            "done": done,
            "fail": fail,
            "damping": damping,
            "it": it,
            "converged_iter": converged_iter,
            "best_err": jnp.minimum(carry["best_err"], err),
        }
        if "history" in carry:
            out["history"] = carry["history"].at[it].set(err)
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
        return OptimizerInfo(
            status=status,
            converged_iter=carry["converged_iter"],
            best_err=carry["best_err"],
            last_err=carry["err"],
            err_history=carry.get("history"),
        )

    # -- user-facing solve (no outer grad bookkeeping; see layer.py) ----
    def optimize(self, values=None, input_tensors=None, verbose: bool = False, **kwargs):
        """Convenience one-shot solve returning (values_dict, info)."""
        co = self.compiled
        values = values or self.objective.default_values(input_tensors)
        bsz = co.resolve_batch_size(values)
        state = co.pack(values, bsz)
        aux = co.build_aux(values, bsz)
        opts = dataclasses.replace(self.opts, **kwargs) if kwargs else self.opts

        def solve(state, aux):
            carry = self.init_carry(state, aux, opts)
            carry = self.run_while(carry, aux, opts.max_iterations, opts)
            return carry

        carry = jax.jit(solve)(state, aux)
        info = self.make_info(carry, opts)
        out = dict(values)
        out.update(co.unpack(carry["state"]))
        return out, info


class GaussNewton(NonlinearLeastSquares):
    """delta = solve(AtA, Atb) (reference gauss_newton.py:17)."""

    method = "gauss_newton"

    def compute_delta(self, AtA, Atb, damping, opts: NLSOptions):
        return self.linear_solver.solve(AtA, Atb, damping=0.0, ellipsoidal=False)


class LevenbergMarquardt(NonlinearLeastSquares):
    """Damped steps with optional per-batch adaptive damping
    (reference levenberg_marquardt.py:51)."""

    method = "levenberg_marquardt"

    def compute_delta(self, AtA, Atb, damping, opts: NLSOptions):
        return self.linear_solver.solve(
            AtA, Atb, damping=damping, ellipsoidal=opts.ellipsoidal_damping
        )

    def _accept_and_damping(self, delta, AtA, Atb, new_err, prev_err, damping, opts):
        if not opts.adaptive_damping:
            b = new_err.shape[0]
            return jnp.ones((b,), dtype=bool), damping
        # gain ratio rho = (prev - new) / (0.5 * delta . (damping*D*delta + Atb))
        # (reference levenberg_marquardt.py:173-201)
        diag = jnp.diagonal(AtA, axis1=-2, axis2=-1)
        dvec = damping_diag(diag, damping, opts.ellipsoidal_damping)
        den = 0.5 * jnp.sum(delta * (dvec * delta + Atb), axis=-1)
        den = jnp.where(den == 0, 1e-12, den)
        rho = (prev_err - new_err) / den
        reject = rho <= opts.damping_accept
        new_damping = jnp.where(
            reject, damping * opts.up_damping_ratio, damping / opts.down_damping_ratio
        )
        new_damping = jnp.clip(new_damping, opts.min_damping, opts.max_damping)
        return ~reject, new_damping
