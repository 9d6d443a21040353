"""Gaussians on manifolds + tangent-space projections.

Re-design of the reference ManifoldGaussian / local_gaussian /
retract_gaussian (theseus/optimizer/manifold_gaussian.py:14,117,158), used
for GBP-style message passing and LEO sampling. Covariance transport follows
the exp-map jacobian rule (Sola et al. 2018, eq. 55):
    lam_tp = J_exp^T lam J_exp  (local),  lam = J_exp^{-T} lam_tp J_exp^{-1}
All functions are per-instance pure (vmap over batch as needed).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ..lie import Group


@dataclasses.dataclass
class ManifoldGaussian:
    """mean: list of group elements; precision: (dof_total, dof_total)."""

    mean: List
    precision: jnp.ndarray
    name: str = "gaussian"

    @property
    def dof(self) -> int:
        return self.precision.shape[-1]


def local_gaussian(group: Group, variable, gaussian: ManifoldGaussian,
                   return_mean: bool = True):
    """Project a single-variable gaussian into the tangent plane at
    `variable` (reference manifold_gaussian.py:117)."""
    if len(gaussian.mean) != 1:
        raise ValueError("local_gaussian expects a single-variable gaussian.")
    mean_tp = group.local(variable, gaussian.mean[0])
    (jac,), _ = group.jexp(mean_tp)
    lam_tp = jnp.swapaxes(jac, -1, -2) @ gaussian.precision @ jac
    if return_mean:
        return mean_tp, lam_tp
    eta_tp = (lam_tp @ mean_tp[..., None])[..., 0]
    return eta_tp, lam_tp


def retract_gaussian(group: Group, variable, mean_tp, precision_tp) -> ManifoldGaussian:
    """Map a tangent-plane gaussian at `variable` back to the manifold
    (reference manifold_gaussian.py:158)."""
    mean = group.retract(variable, mean_tp)
    (jac,), _ = group.jexp(mean_tp)
    inv_jac = jnp.linalg.inv(jac)
    precision = jnp.swapaxes(inv_jac, -1, -2) @ precision_tp @ inv_jac
    return ManifoldGaussian(mean=[mean], precision=precision)
