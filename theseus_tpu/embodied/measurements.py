"""Measurement cost functions: Between, MovingFrameBetween, Reprojection.

Re-designs of the reference embodied measurement costs
(theseus/embodied/measurements/between.py:14, moving_frame_between.py:14,
reprojection.py:13) as per-instance pure residuals with analytic
right-tangent jacobians composed from the functional Lie jops.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.cost_function import CostFunction
from ..core.cost_weight import CostWeight
from ..core.variable import ManifoldVariable, Variable, as_variable


class Between(CostFunction):
    """residual = log(measurement^{-1} (v1^{-1} v2)); the PGO workhorse
    (reference between.py:14). Analytic jacobians:
    J2 = jlog(m^{-1} d), J1 = -J2 @ Adj(d^{-1}) with d = v1^{-1} v2."""

    has_analytic_jacobians = True

    def __init__(
        self,
        v1: ManifoldVariable,
        v2: ManifoldVariable,
        measurement,
        cost_weight: Optional[CostWeight] = None,
        name: Optional[str] = None,
    ):
        if v1.group != v2.group:
            raise ValueError("Between requires variables of the same group.")
        measurement = as_variable(measurement)
        super().__init__([v1, v2], [measurement], cost_weight, name)
        self.group = v1.group

    def dim(self):
        return self.group.dof

    def error_impl(self, optim, aux):
        v1, v2 = optim
        (meas,) = aux
        g = self.group
        return g.local(meas, g.between(v1, v2))

    def jacobians_impl(self, optim, aux):
        v1, v2 = optim
        (meas,) = aux
        g = self.group
        diff = g.between(v1, v2)
        (jl,), res = g.jlog(g.compose(g.inverse(meas), diff))
        j2 = jl
        j1 = -(jl @ g.adjoint(g.inverse(diff)))
        return [j1, j2], res

    def fused_linearize(self, xs, aux):
        """Whole-bucket fused Pallas linearization (SE3, f32, TPU backends).

        xs: per-slot stacked (K, B, 3, 4); aux: ((K|-, B, 3, 4),). Returns
        ((j1, j2), err) with shapes (K, B, 6, 6)/(K, B, 6), or None to fall
        back to the vmapped per-instance path."""
        from ..config import _PALLAS_INTERPRET, pallas_enabled

        if self.group.name != "SE3":
            return None
        v1, v2 = xs
        if not pallas_enabled(v1.dtype):
            return None
        (meas,) = aux
        if meas.ndim == v1.ndim - 1:  # shared measurement: broadcast
            meas = jnp.broadcast_to(meas, v1.shape)
        from ..ops.pallas_between_soa import between_linearize_soa

        j1, j2, err = between_linearize_soa(
            v1, v2, meas, interpret=_PALLAS_INTERPRET
        )
        return (j1, j2), err

    def fused_error(self, xs, aux):
        """Fused error-only evaluation (same kernel; jacobians cost ~nothing
        and XLA drops unused outputs downstream)."""
        out = self.fused_linearize(xs, aux)
        if out is None:
            return None
        return out[1]


class MovingFrameBetween(CostFunction):
    """Between in a moving frame (tactile estimation; reference
    moving_frame_between.py:14). residual = log(m^{-1} B) with
    B = (f1^{-1} p1)^{-1} (f2^{-1} p2). Unlike the reference (which drops the
    jlog factor as a GN approximation), jacobians here chain through jlog."""

    has_analytic_jacobians = True

    def __init__(self, frame1, frame2, pose1, pose2, measurement,
                 cost_weight=None, name=None):
        groups = {v.group.name for v in (frame1, frame2, pose1, pose2)}
        if len(groups) > 1:
            raise ValueError("Inconsistent variable types.")
        measurement = as_variable(measurement)
        super().__init__([frame1, frame2, pose1, pose2], [measurement], cost_weight, name)
        self.group = frame1.group

    def dim(self):
        return self.group.dof

    def error_impl(self, optim, aux):
        f1, f2, p1, p2 = optim
        (meas,) = aux
        g = self.group
        b1 = g.between(f1, p1)
        b2 = g.between(f2, p2)
        return g.local(meas, g.between(b1, b2))

    def jacobians_impl(self, optim, aux):
        f1, f2, p1, p2 = optim
        (meas,) = aux
        g = self.group
        (jb1_f1, jb1_p1), b1 = g.jbetween(f1, p1)
        (jb2_f2, jb2_p2), b2 = g.jbetween(f2, p2)
        (jo_b1, jo_b2), diff = g.jbetween(b1, b2)
        (jl,), res = g.jlog(g.compose(g.inverse(meas), diff))
        j_f1 = jl @ jo_b1 @ jb1_f1
        j_p1 = jl @ jo_b1 @ jb1_p1
        j_f2 = jl @ jo_b2 @ jb2_f2
        j_p2 = jl @ jo_b2 @ jb2_p2
        return [j_f1, j_f2, j_p1, j_p2], res


class Reprojection(CostFunction):
    """Pinhole + 2-parameter radial distortion reprojection residual, the BA
    workhorse (reference reprojection.py:13; BAL camera convention:
    proj = -p[:2]/p[2], factor = f*(1 + r2*(k1 + r2*k2)))."""

    has_analytic_jacobians = False  # jacfwd through retract is exact & fused

    def __init__(
        self,
        camera_pose: ManifoldVariable,  # SE3
        world_point: ManifoldVariable,  # Point3
        focal_length,
        image_feature_point,
        calib_k1=None,
        calib_k2=None,
        cost_weight: Optional[CostWeight] = None,
        name: Optional[str] = None,
    ):
        focal_length = as_variable(focal_length)
        image_feature_point = as_variable(image_feature_point)
        calib_k1 = as_variable(calib_k1 if calib_k1 is not None else jnp.zeros((1, 1)))
        calib_k2 = as_variable(calib_k2 if calib_k2 is not None else jnp.zeros((1, 1)))
        super().__init__(
            [camera_pose, world_point],
            [focal_length, image_feature_point, calib_k1, calib_k2],
            cost_weight,
            name,
        )
        self.group = camera_pose.group

    def dim(self):
        return 2

    def error_impl(self, optim, aux):
        pose, point = optim
        focal, feat, k1, k2 = aux
        from ..lie import se3

        point_cam = se3.transform(pose, point)
        proj = -point_cam[:2] / point_cam[2]
        r2 = jnp.sum(proj * proj)
        factor = focal[0] * (1.0 + r2 * (k1[0] + r2 * k2[0]))
        return proj * factor - feat

    def _fused_inputs(self, xs, aux):
        from ..config import pallas_enabled

        pose, point = xs
        if self.group.name != "SE3" or not pallas_enabled(pose.dtype):
            return None
        out = [pose, point]
        for a in aux:  # focal, feat, k1, k2; broadcast shared (B, s) slots
            if a.ndim == pose.ndim - 2:
                a = jnp.broadcast_to(a, pose.shape[:1] + a.shape)
            out.append(a)
        return out

    def fused_linearize(self, xs, aux):
        """Whole-bucket fused Pallas linearization (closed-form jacobians;
        see ops/pallas_reprojection.py)."""
        from ..config import _PALLAS_INTERPRET

        inputs = self._fused_inputs(xs, aux)
        if inputs is None:
            return None
        from ..ops.pallas_reprojection import reprojection_linearize_soa

        jpose, jpt, err = reprojection_linearize_soa(
            *inputs, interpret=_PALLAS_INTERPRET
        )
        return (jpose, jpt), err

    def fused_error(self, xs, aux):
        out = self.fused_linearize(xs, aux)
        if out is None:
            return None
        return out[1]
