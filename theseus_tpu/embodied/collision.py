"""Collision costs: 2D signed distance field, hinge collision cost, and the
effector-object contact constraint.

Re-designs of the reference collision module (theseus/embodied/collision/
signed_distance_field.py:16, collision.py:17, eff_obj_contact.py:17) as pure
per-instance functions; the SDF is bilinear interpolation with clamped cell
gathers (differentiable everywhere except cell boundaries, same as the
reference's explicit-gradient version)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.cost_function import CostFunction
from ..core.variable import ManifoldVariable, Variable, as_variable
from ..lie import se2 as se2_ops


def sdf_signed_distance(sdf_data, origin, cell_size, point):
    """Single-point bilinear SDF lookup (reference signed_distance_field.py:
    195-241). sdf_data (H, W) [row ~ y, col ~ x], origin (2,), cell_size (1,),
    point (2,). Returns (dist, out_of_bounds)."""
    rows, cols = sdf_data.shape
    cs = cell_size[0] if cell_size.ndim else cell_size
    px, py = point[0], point[1]
    oob = (
        (px < origin[0])
        | (px > origin[0] + (cols - 1.0) * cs)
        | (py < origin[1])
        | (py > origin[1] + (rows - 1.0) * cs)
    )
    col = (px - origin[0]) / cs
    row = (py - origin[1]) / cs
    lr = jnp.floor(row)
    lc = jnp.floor(col)
    lri = jnp.clip(lr.astype(jnp.int32), 0, rows - 1)
    lci = jnp.clip(lc.astype(jnp.int32), 0, cols - 1)
    hri = jnp.clip(lri + 1, 0, rows - 1)
    hci = jnp.clip(lci + 1, 0, cols - 1)
    hrdiff = lr + 1.0 - row
    hcdiff = lc + 1.0 - col
    lrdiff = row - lr
    lcdiff = col - lc
    dist = (
        hrdiff * hcdiff * sdf_data[lri, lci]
        + lrdiff * hcdiff * sdf_data[hri, lci]
        + hrdiff * lcdiff * sdf_data[lri, hci]
        + lrdiff * lcdiff * sdf_data[hri, hci]
    )
    return jnp.where(oob, 0.0, dist), oob


def occupancy_to_sdf(occupancy_map: np.ndarray, cell_size: float,
                     threshold: float = 0.75) -> np.ndarray:
    """Occupancy grid -> SDF via euclidean distance transforms (reference
    _compute_sdf_data_from_map, using scipy.ndimage)."""
    from scipy import ndimage

    occ = np.asarray(occupancy_map) >= threshold
    if occ.all():
        return -np.ones_like(occupancy_map, dtype=np.float64) * cell_size
    if (~occ).all():
        return np.ones_like(occupancy_map, dtype=np.float64) * cell_size
    inv = ~occ
    dist_out = ndimage.distance_transform_edt(inv) * cell_size
    dist_in = ndimage.distance_transform_edt(occ) * cell_size
    return dist_out - dist_in


class Collision2D(CostFunction):
    """Hinge on SDF lookup: err = max(cost_eps - dist, 0)
    (reference collision.py:17). Pose is Point2 or SE2."""

    has_analytic_jacobians = False

    def __init__(
        self,
        pose: ManifoldVariable,
        sdf_origin,
        sdf_data,
        sdf_cell_size,
        cost_eps,
        cost_weight=None,
        name: Optional[str] = None,
    ):
        self.is_se2 = pose.group.name == "SE2"
        if not self.is_se2 and pose.group.dof != 2:
            raise ValueError("Collision2D only accepts Point2 or SE2 poses.")
        aux = [
            as_variable(sdf_origin),
            as_variable(sdf_data),
            as_variable(_as_row(sdf_cell_size)),
            as_variable(_as_row(cost_eps)),
        ]
        super().__init__([pose], aux, cost_weight, name)

    def dim(self):
        return 1

    def error_impl(self, optim, aux):
        (pose,) = optim
        origin, sdf_data, cell_size, cost_eps = aux
        xy = pose[:2] if self.is_se2 else pose
        dist, _ = sdf_signed_distance(sdf_data, origin, cell_size, xy)
        return jnp.maximum(cost_eps - dist, 0.0)


class EffectorObjectContactPlanar(CostFunction):
    """|dist(obj^{-1} eff_xy) - eff_radius| contact constraint
    (reference eff_obj_contact.py:17)."""

    has_analytic_jacobians = False

    def __init__(
        self,
        obj: ManifoldVariable,  # SE2
        eff: ManifoldVariable,  # SE2
        sdf_origin,
        sdf_data,
        sdf_cell_size,
        eff_radius,
        cost_weight=None,
        name: Optional[str] = None,
    ):
        aux = [
            as_variable(sdf_origin),
            as_variable(sdf_data),
            as_variable(_as_row(sdf_cell_size)),
            as_variable(_as_row(eff_radius)),
        ]
        super().__init__([obj, eff], aux, cost_weight, name)

    def dim(self):
        return 1

    def error_impl(self, optim, aux):
        obj, eff = optim
        origin, sdf_data, cell_size, eff_radius = aux
        eff__obj = se2_ops.untransform(obj, eff[:2])
        dist, _ = sdf_signed_distance(sdf_data, origin, cell_size, eff__obj)
        return jnp.abs(dist - eff_radius)


def _as_row(v):
    if isinstance(v, Variable):
        return v
    arr = jnp.asarray(v)
    if arr.ndim == 0:
        return arr.reshape(1, 1)
    if arr.ndim == 1:
        return arr.reshape(-1, 1)
    return arr
