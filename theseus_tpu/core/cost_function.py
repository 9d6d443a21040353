"""Cost functions: weighted residual terms over manifold variables.

Re-design of the reference CostFunction/AutoDiffCostFunction
(theseus/core/cost_function.py:64,203). Differences from the reference, by
design:

- The residual contract is a *pure per-instance, per-batch-element* function
  `error_impl(optim: tuple[Array], aux: tuple[Array]) -> (dim,)`. The compiler
  vmaps it over cost instances and over the batch — this subsumes both the
  reference's batched tensors and its `Vectorize` schema fusion
  (core/vectorizer.py:112) in one trace-time transform.
- Autodiff jacobians are computed in the *tangent space directly* by
  differentiating `error(retract(x, delta))` at delta=0 with `jax.jacfwd`
  (composed under vmap). This replaces the reference's
  vmap(jacrev) + Manifold.project pipeline (cost_function.py:341,390) — the
  projection to the tangent is built into the parametrization.
- Analytic jacobians (reference's hand-written `jacobians()`) are supplied by
  overriding `jacobians_impl`, returning right-tangent jacobians.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .cost_weight import CostWeight, ScaleCostWeight
from .robust_loss import LOSS_EPS
from .variable import ManifoldVariable, Variable, as_variable


class CostFunction:
    """Base class. Subclasses define `dim`, `error_impl`, and optionally
    `jacobians_impl` (analytic tangent jacobians)."""

    has_analytic_jacobians = False

    def __init__(
        self,
        optim_vars: Sequence[ManifoldVariable],
        aux_vars: Sequence[Variable] = (),
        cost_weight: Optional[CostWeight] = None,
        name: Optional[str] = None,
    ):
        if len(optim_vars) < 1:
            raise ValueError("At least one optimization variable is required.")
        for v in optim_vars:
            if not isinstance(v, ManifoldVariable):
                raise TypeError(f"Optim var {v} must be a ManifoldVariable.")
        self.optim_vars: Tuple[ManifoldVariable, ...] = tuple(optim_vars)
        self.aux_vars: Tuple[Variable, ...] = tuple(as_variable(a) for a in aux_vars)
        self.weight: CostWeight = cost_weight or ScaleCostWeight(1.0)
        self.name = name or f"{type(self).__name__}__{id(self)}"

    def dim(self) -> int:
        raise NotImplementedError

    # --- pure single-instance functions --------------------------------
    def error_impl(self, optim: Tuple, aux: Tuple):
        """(tuple of element arrays, tuple of aux arrays) -> (dim,)."""
        raise NotImplementedError

    def jacobians_impl(self, optim: Tuple, aux: Tuple):
        """Optional analytic: returns (list[(dim, dof_s)], err)."""
        raise NotImplementedError

    def jacobians_fn(self):
        """Returns a pure fn (optim, aux) -> (jacs, err); autodiff fallback
        differentiates through the retract parametrization at delta=0."""
        if self.has_analytic_jacobians:
            return lambda optim, aux: self.jacobians_impl(optim, aux)
        groups = tuple(v.group for v in self.optim_vars)

        # forward- vs reverse-mode tangent jacobians: the analog of the
        # reference's AutogradMode ablation (core/cost_function.py:161).
        # "fwd" (default) is right when dim >= total dof (most residuals);
        # "rev" wins for low-dim residuals over many/large variables.
        jac_op = jax.jacrev if getattr(self, "autograd_mode", "fwd") == "rev" else jax.jacfwd

        def jfn(optim, aux):
            def at(deltas):
                retracted = tuple(
                    g.retract(x, d) for g, x, d in zip(groups, optim, deltas)
                )
                return self.error_impl(retracted, aux)

            zeros = tuple(jnp.zeros(g.dof, dtype=optim[0].dtype) for g in groups)
            err, jacs = at(zeros), jac_op(at)(zeros)
            return list(jacs), err

        return jfn

    # --- schema for trace-time bucketing --------------------------------
    def schema(self):
        """Costs with equal schema are fused into one vmapped evaluation
        (the reference groups by class + var shapes + err_fn id,
        core/vectorizer.py:22)."""
        return (
            type(self).__name__,
            tuple(v.group.name for v in self.optim_vars),
            tuple(None if a.tensor is None else tuple(a.tensor.shape[1:]) for a in self.aux_vars),
            self.weight.schema(),
            self.dim(),
        )

    def __repr__(self):
        return f"{type(self).__name__}(name={self.name}, dim={self.dim()})"


class AutoDiffCostFunction(CostFunction):
    """User-supplied residual function (reference core/cost_function.py:203).

    `err_fn(optim_vars: tuple[Array], aux_vars: tuple[Array]) -> (dim,)`
    operates on single-instance, single-batch-element arrays; batching and
    instance fusion are applied by the compiler (so there is no need for the
    reference's DENSE/LOOP_BATCH/VMAP autograd modes — VMAP semantics are the
    only mode, applied at trace time)."""

    def __init__(
        self,
        optim_vars: Sequence[ManifoldVariable],
        dim: int,
        err_fn: Callable,
        aux_vars: Sequence[Variable] = (),
        cost_weight: Optional[CostWeight] = None,
        name: Optional[str] = None,
        autograd_mode: str = "fwd",
    ):
        super().__init__(optim_vars, aux_vars, cost_weight, name)
        self._dim = dim
        self._err_fn = err_fn
        if autograd_mode not in ("fwd", "rev"):
            raise ValueError("autograd_mode must be 'fwd' or 'rev'")
        self.autograd_mode = autograd_mode

    def dim(self) -> int:
        return self._dim

    def error_impl(self, optim, aux):
        return self._err_fn(optim, aux)

    def schema(self):
        return super().schema() + (id(self._err_fn), self.autograd_mode)


def _as_batched_scalar(value):
    """Coerce a user scalar (Python/numpy float or 0-d/1-d array) to a
    (1, 1) aux Variable: every aux operand must carry a leading batch dim
    (build_aux broadcasts on shape[0]; reference wraps these the same way,
    robust_cost_function.py:63-75)."""
    if isinstance(value, Variable):
        v = value
    else:
        v = as_variable(value)
    t = v.tensor
    if t is not None:
        if getattr(t, "ndim", 2) == 0:
            v.tensor = t.reshape(1, 1)
        elif t.ndim == 1:  # (B,) -> (B, 1): 1-d means per-batch values
            v.tensor = t.reshape(-1, 1)
    return v


class RobustCostFunction(CostFunction):
    """Wraps a cost function with a robust loss rho applied to ||w e||^2
    (reference core/robust_cost_function.py:51). The weighted error reported
    for metrics is ones*sqrt(loss/dim) so that sum-of-squares equals the loss
    value; linearization rescales err/jacs by sqrt(rho') (Triggs correction
    with alpha=0, reference robust_cost_function.py:115-135)."""

    def __init__(
        self,
        cost_function: CostFunction,
        loss_cls,
        log_loss_radius,
        flatten_dims: bool = False,
        name: Optional[str] = None,
    ):
        log_loss_radius = _as_batched_scalar(log_loss_radius)
        super().__init__(
            cost_function.optim_vars,
            tuple(cost_function.aux_vars) + (log_loss_radius,),
            cost_function.weight,
            name or f"Robust__{cost_function.name}",
        )
        self.cost_function = cost_function
        self.loss_cls = loss_cls
        self.log_loss_radius = log_loss_radius
        self.flatten_dims = flatten_dims

    @property
    def has_analytic_jacobians(self):
        return self.cost_function.has_analytic_jacobians

    def dim(self) -> int:
        return self.cost_function.dim()

    def error_impl(self, optim, aux):
        return self.cost_function.error_impl(optim, aux[:-1])

    def jacobians_impl(self, optim, aux):
        return self.cost_function.jacobians_impl(optim, aux[:-1])

    def jacobians_fn(self):
        inner = self.cost_function.jacobians_fn()
        return lambda optim, aux: inner(optim, aux[:-1])

    def robust_apply_error(self, werr, log_radius, mu=None):
        """Metric-mode error transform (after weighting)."""
        d = self.dim()
        if self.flatten_dims:
            loss = self._loss_eval(werr**2, log_radius, mu)
            return jnp.sqrt(loss + LOSS_EPS)
        sq = jnp.sum(werr**2)
        loss = self._loss_eval(sq, log_radius, mu)
        return jnp.ones_like(werr) * jnp.sqrt(loss / d + LOSS_EPS)

    def robust_rescale(self, werr, log_radius, mu=None):
        """sqrt(rho') factor(s) for linearization; shape () or (dim,)."""
        if self.flatten_dims:
            return jnp.sqrt(self._loss_lin(werr**2, log_radius, mu) + LOSS_EPS)
        sq = jnp.sum(werr**2)
        return jnp.sqrt(self._loss_lin(sq, log_radius, mu) + LOSS_EPS)

    def _loss_eval(self, x, log_radius, mu):
        if self.loss_cls.is_gnc:
            return self.loss_cls.evaluate(x, log_radius, 1.0 if mu is None else mu)
        return self.loss_cls.evaluate(x, log_radius)

    def _loss_lin(self, x, log_radius, mu):
        if self.loss_cls.is_gnc:
            return self.loss_cls.linearize(x, log_radius, 1.0 if mu is None else mu)
        return self.loss_cls.linearize(x, log_radius)

    def schema(self):
        return (
            "Robust",
            self.loss_cls.__name__,
            self.flatten_dims,
            self.cost_function.schema(),
        )


class GNCRobustCostFunction(RobustCostFunction):
    """Robust cost with a graduated-non-convexity control value mu as an
    extra aux variable (reference core/robust_cost_function.py:176): the
    outer loop anneals mu from large (near-quadratic) toward 1 (full robust
    loss). aux layout: inner aux + (log_loss_radius, gnc_control_val)."""

    def __init__(self, cost_function, loss_cls, log_loss_radius,
                 gnc_control_val, flatten_dims: bool = False, name=None):
        if not getattr(loss_cls, "is_gnc", False):
            raise ValueError(f"{loss_cls.__name__} is not a GNC-capable loss.")
        super().__init__(cost_function, loss_cls, log_loss_radius,
                         flatten_dims=flatten_dims, name=name)
        gnc_control_val = _as_batched_scalar(gnc_control_val)
        self.gnc_control_val = gnc_control_val
        self.aux_vars = tuple(self.aux_vars) + (gnc_control_val,)

    def error_impl(self, optim, aux):
        return self.cost_function.error_impl(optim, aux[:-2])

    def jacobians_impl(self, optim, aux):
        return self.cost_function.jacobians_impl(optim, aux[:-2])

    def jacobians_fn(self):
        inner = self.cost_function.jacobians_fn()
        return lambda optim, aux: inner(optim, aux[:-2])

    def schema(self):
        return ("GNC",) + super().schema()
