"""Cost weights: sqrt-precision factors applied to errors and jacobians.

Re-design of the reference CostWeight family (theseus/core/cost_weight.py:20,
60, 97). Weights are pure per-instance functions `apply(err, jacs, waux)`;
their parameters are aux variables so they can be learned by the outer loop.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from .variable import Variable, as_variable


class CostWeight:
    """Base: subclasses define aux_vars and the pure `apply` transform."""

    def __init__(self, name: Optional[str] = None):
        self.name = name or f"{type(self).__name__}_{id(self)}"

    @property
    def aux_vars(self) -> Tuple[Variable, ...]:
        return ()

    def schema(self):
        return (type(self).__name__,)

    def apply(self, err, jacs, waux):
        """err: (dim,), jacs: list[(dim, dof)] or None, waux: tuple of arrays.

        Returns (weighted_err, weighted_jacs)."""
        raise NotImplementedError

    def apply_batched(self, err, jacs, waux):
        """Batched form over leading (K, B) dims (used by fused kernels);
        None means unsupported and the caller falls back to vmap."""
        return None

    def is_zero(self, waux):
        """Boolean indicator of fully-zero weights, broadcastable against the
        leading dims of the weighted error (reference CostWeight.is_zero,
        theseus/core/cost_weight.py:29). The compiled objective uses it to
        where-mask weighted errors/jacobians — the TPU analog of the
        reference's masked_jacobians skip (cost_function.py:37): static
        shapes rule out gather-style skipping, but the mask guarantees
        zero-weight residuals contribute exactly 0 even if the unweighted
        error is NaN/inf. None = cannot tell (no masking applied)."""
        return None


class ScaleCostWeight(CostWeight):
    """Scalar scale (reference core/cost_weight.py:60)."""

    def __init__(self, scale=1.0, name: Optional[str] = None):
        super().__init__(name)
        if isinstance(scale, (bool, int, float)):
            # memoized weak-typed (1, 1) constant: one device dispatch per
            # distinct value, not one per cost (and no strong-f64 promotion);
            # bounded + x64-aware via the shared scalar memo
            from .variable import _memo_scalar

            scale = _memo_scalar(scale, shape=(1, 1))
        v = as_variable(scale)
        if v.tensor.ndim == 0:
            v.tensor = v.tensor.reshape(1, 1)
        elif v.tensor.ndim == 1:
            v.tensor = v.tensor.reshape(-1, 1)
        self.scale = v

    @property
    def aux_vars(self):
        return (self.scale,)

    def apply(self, err, jacs, waux):
        (s,) = waux  # (1,) per batch element
        werr = err * s
        wjacs = None if jacs is None else [j * s for j in jacs]
        return werr, wjacs

    def apply_batched(self, err, jacs, waux):
        (s,) = waux  # (K, B, 1) or (B, 1); right-aligned broadcasting
        werr = err * s
        wjacs = None if jacs is None else [j * s[..., None] for j in jacs]
        return werr, wjacs

    def is_zero(self, waux):
        (s,) = waux  # (..., 1)
        return s[..., 0] == 0


class DiagonalCostWeight(CostWeight):
    """Per-dim diagonal weight (reference core/cost_weight.py:97)."""

    def __init__(self, diagonal, name: Optional[str] = None):
        super().__init__(name)
        v = as_variable(diagonal)
        if v.tensor.ndim == 1:
            v.tensor = v.tensor[None]
        self.diagonal = v

    @property
    def aux_vars(self):
        return (self.diagonal,)

    def apply(self, err, jacs, waux):
        (d,) = waux  # (dim,)
        werr = err * d
        wjacs = None if jacs is None else [j * d[:, None] for j in jacs]
        return werr, wjacs

    def apply_batched(self, err, jacs, waux):
        (d,) = waux
        werr = err * d
        wjacs = None if jacs is None else [j * d[..., None] for j in jacs]
        return werr, wjacs

    def is_zero(self, waux):
        (d,) = waux  # (..., dim); zero only if every diagonal entry is zero
        return jnp.all(d == 0, axis=-1)
