"""Motion-model costs: GP (GPMP2-style) priors, hinge limits, nonholonomic
constraint, quasi-static planar pushing.

Re-designs of theseus/embodied/motionmodel/double_integrator.py:14,94,179 and
misc.py:14,97 and quasi_static_pushing_planar.py:19."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.cost_function import CostFunction
from ..core.cost_weight import CostWeight
from ..core.variable import ManifoldVariable, Variable, as_variable
from ..lie import se2 as se2_ops
from ..lie import so2 as so2_ops


class DoubleIntegrator(CostFunction):
    """err = [local(pose1, pose2) - dt*vel1 ; vel2 - vel1]
    (reference double_integrator.py:14). Analytic jacobians."""

    has_analytic_jacobians = True

    def __init__(self, pose1, vel1, pose2, vel2, dt, cost_weight=None, name=None):
        dof = pose1.group.dof
        if not (vel1.group.dof == pose2.group.dof == vel2.group.dof == dof):
            raise ValueError("All DoubleIntegrator variables need equal dof.")
        dt = as_variable(jnp.reshape(jnp.asarray(dt), (-1, 1)))
        super().__init__([pose1, vel1, pose2, vel2], [dt], cost_weight, name)
        self.group = pose1.group

    def dim(self):
        return 2 * self.group.dof

    def error_impl(self, optim, aux):
        p1, v1, p2, v2 = optim
        (dt,) = aux
        diff = self.group.local(p1, p2)
        return jnp.concatenate([diff - dt[0] * v1, v2 - v1])

    def jacobians_impl(self, optim, aux):
        p1, v1, p2, v2 = optim
        (dt,) = aux
        g = self.group
        dof = g.dof
        (jl1, jl2), diff = g.jlocal(p1, p2)
        err = jnp.concatenate([diff - dt[0] * v1, v2 - v1])
        zero = jnp.zeros((dof, dof), dtype=diff.dtype)
        eye = jnp.eye(dof, dtype=diff.dtype)
        j_p1 = jnp.concatenate([jl1, zero], axis=0)
        j_v1 = jnp.concatenate([-dt[0] * eye, -eye], axis=0)
        j_p2 = jnp.concatenate([jl2, zero], axis=0)
        j_v2 = jnp.concatenate([zero, eye], axis=0)
        return [j_p1, j_v1, j_p2, j_v2], err


class GPCostWeight(CostWeight):
    """GPMP2 GP-prior weight: upper Cholesky factor of the 2dof x 2dof
    inverse covariance assembled from Qc_inv and dt
    (reference double_integrator.py:94-177)."""

    def __init__(self, Qc_inv, dt, name: Optional[str] = None):
        super().__init__(name)
        q = as_variable(Qc_inv)
        if q.tensor.ndim == 2:
            q.tensor = q.tensor[None]
        self.Qc_inv = q
        d = as_variable(jnp.reshape(jnp.asarray(dt), (-1, 1)))
        self.dt = d

    @property
    def aux_vars(self):
        return (self.Qc_inv, self.dt)

    def _weight_matrix(self, qc_inv, dt):
        dof = qc_inv.shape[-1]
        dt = dt[0]
        q11 = 12.0 * dt ** (-3.0) * qc_inv
        q12 = -6.0 * dt ** (-2.0) * qc_inv
        q22 = 4.0 / dt * qc_inv
        top = jnp.concatenate([q11, q12], axis=-1)
        bottom = jnp.concatenate([q12, q22], axis=-1)
        w = jnp.concatenate([top, bottom], axis=-2)
        # upper cholesky U with U^T U = W  =>  ||U e||^2 = e^T W e
        return jnp.swapaxes(jnp.linalg.cholesky(jnp.swapaxes(w, -1, -2)), -1, -2)

    def apply(self, err, jacs, waux):
        qc_inv, dt = waux
        u = self._weight_matrix(qc_inv, dt)
        werr = u @ err
        wjacs = None if jacs is None else [u @ j for j in jacs]
        return werr, wjacs


class GPMotionModel(DoubleIntegrator):
    """DoubleIntegrator with a GPCostWeight (reference :179)."""

    def __init__(self, pose1, vel1, pose2, vel2, dt, cost_weight, name=None):
        if not isinstance(cost_weight, GPCostWeight):
            raise ValueError("GPMotionModel requires a GPCostWeight.")
        super().__init__(pose1, vel1, pose2, vel2, dt, cost_weight, name)


class HingeCost(CostFunction):
    """Two-sided hinge on vector limits (reference misc.py:14)."""

    has_analytic_jacobians = True

    def __init__(self, vector, down_limit, up_limit, threshold,
                 cost_weight=None, name=None):
        dof = vector.group.dof

        def conv(v):
            arr = jnp.asarray(v, dtype=jnp.result_type(float))
            if arr.ndim == 0:
                arr = jnp.ones((1, dof)) * arr
            elif arr.ndim == 1:
                arr = arr[None]
            return arr

        aux = [as_variable(conv(down_limit)), as_variable(conv(up_limit)),
               as_variable(conv(threshold))]
        super().__init__([vector], aux, cost_weight, name)
        self._dof = dof

    def dim(self):
        return self._dof

    def _err(self, v, aux):
        down, up, thr = aux
        dl = down + thr
        ul = up - thr
        below = v < dl
        above = v > ul
        err = jnp.where(below, dl - v, jnp.where(above, v - ul, 0.0))
        return err, below, above

    def error_impl(self, optim, aux):
        return self._err(optim[0], aux)[0]

    def jacobians_impl(self, optim, aux):
        err, below, above = self._err(optim[0], aux)
        diag = jnp.where(below, -1.0, jnp.where(above, 1.0, 0.0))
        return [jnp.diag(diag.reshape(-1))], err


class Nonholonomic(CostFunction):
    """Zero side-velocity constraint for planar robots (reference misc.py:97).
    Pose is SE2 or a 3-vector (x, y, theta); vel is a 3-vector."""

    has_analytic_jacobians = True

    def __init__(self, pose, vel, cost_weight=None, name=None):
        if vel.group.dof != 3 or pose.group.dof != 3:
            raise ValueError("Nonholonomic needs 3D pose and velocity.")
        super().__init__([pose, vel], [], cost_weight, name)
        self.pose_is_se2 = pose.group.name == "SE2"

    def dim(self):
        return 1

    def error_impl(self, optim, aux):
        pose, vel = optim
        if self.pose_is_se2:
            return vel[1:2]
        cos = jnp.cos(pose[2])
        sin = jnp.sin(pose[2])
        return (vel[1] * cos - vel[0] * sin)[None]

    def jacobians_impl(self, optim, aux):
        pose, vel = optim
        dtype = vel.dtype
        if self.pose_is_se2:
            jp = jnp.zeros((1, 3), dtype)
            jv = jnp.zeros((1, 3), dtype).at[0, 1].set(1.0)
            return [jp, jv], vel[1:2]
        cos = jnp.cos(pose[2])
        sin = jnp.sin(pose[2])
        err = (vel[1] * cos - vel[0] * sin)[None]
        jp = jnp.zeros((1, 3), dtype).at[0, 2].set(-(vel[1] * sin + vel[0] * cos))
        jv = jnp.zeros((1, 3), dtype).at[0, 0].set(-sin).at[0, 1].set(cos)
        return [jp, jv], err


class QuasiStaticPushingPlanar(CostFunction):
    """Planar pushing dynamics residual D V - Vp = 0 (Zhou et al. 2017;
    reference quasi_static_pushing_planar.py:19). Jacobians by autodiff —
    exact, and fused by XLA (the reference hand-chains ~10 jacobians)."""

    has_analytic_jacobians = False

    def __init__(self, obj1, obj2, eff1, eff2, c_square, cost_weight=None, name=None):
        c = as_variable(jnp.reshape(jnp.asarray(c_square), (-1, 1)))
        super().__init__([obj1, obj2, eff1, eff2], [c], cost_weight, name)

    def dim(self):
        return 3

    def error_impl(self, optim, aux):
        obj1, obj2, eff1, eff2 = optim
        (c_square,) = aux
        o2_rot = obj2[2:4]

        # D from current contact point in object frame
        cp2 = eff2[:2]
        cp2_obj = se2_ops.untransform(obj2, cp2)
        px, py = cp2_obj[0], cp2_obj[1]
        d = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], dtype=obj1.dtype
        )
        d = d.at[0, 2].set(-py).at[2, 0].set(-py)
        d = d.at[1, 2].set(px).at[2, 1].set(px)
        d = d.at[2, 2].set(-c_square[0])

        # V: object velocity in object frame + angular velocity
        v_world = obj2[:2] - obj1[:2]
        v_obj = so2_ops.unrotate(o2_rot, v_world)
        omega = se2_ops.log(se2_ops.compose(se2_ops.inverse(obj1), obj2))[2]
        v = jnp.array([0.0, 0.0, 0.0], dtype=obj1.dtype)
        v = v.at[0].set(v_obj[0]).at[1].set(v_obj[1]).at[2].set(omega)

        # Vp: contact-point velocity in object frame
        vc_world = cp2 - eff1[:2]
        vc_obj = so2_ops.unrotate(o2_rot, vc_world)
        vp = jnp.array([0.0, 0.0, 0.0], dtype=obj1.dtype)
        vp = vp.at[0].set(vc_obj[0]).at[1].set(vc_obj[1])

        return d @ v - vp
