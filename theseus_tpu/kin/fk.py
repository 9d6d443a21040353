"""Differentiable forward kinematics with analytic body/spatial jacobians.

Re-design of the reference ForwardKinematicsFactory
(torchkin/torchkin/forward_kinematics.py:17,128): the kinematic tree is
static structure, so FK is an unrolled compose chain traced once under jit
(XLA fuses it); jacobians are analytic screw-axis columns
J_b[:, i] = Adj(T_l^{-1} T_ci) xi_i rather than the reference's custom
autograd backward — and because every op here has a custom_jvp, plain
jax.jacfwd/jacrev of `fk` agrees with the analytic functions (tested).

Tangent convention: [linear(3); angular(3)], matching theseus_tpu.lie.se3.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..lie import se3
from .robot import Robot


def _joint_motion(kind: str, axis: np.ndarray, theta):
    """(..., ) angle -> (..., 3, 4) joint motion transform."""
    ax = jnp.asarray(axis, dtype=theta.dtype)
    if kind == "revolute":
        w = theta[..., None] * ax
        r = _axis_angle_rotation(ax, theta)
        t = jnp.zeros(theta.shape + (3,), dtype=theta.dtype)
        return se3.from_rot_trans(r, t)
    else:  # prismatic
        r = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), theta.shape + (3, 3))
        t = theta[..., None] * ax
        return se3.from_rot_trans(r, t)


def _axis_angle_rotation(ax, theta):
    """Rodrigues for a fixed unit axis (exact, no small-angle branch needed)."""
    from ..lie.utils import so3_hat, outer

    c = jnp.cos(theta)[..., None, None]
    s = jnp.sin(theta)[..., None, None]
    axb = jnp.broadcast_to(ax, theta.shape + (3,))
    k = so3_hat(axb)
    eye = jnp.eye(3, dtype=theta.dtype)
    return c * eye + s * k + (1 - c) * outer(axb, axb)


def _screw(kind: str, axis: np.ndarray, dtype):
    ax = jnp.asarray(axis, dtype=dtype)
    zero = jnp.zeros(3, dtype=dtype)
    if kind == "revolute":
        return jnp.concatenate([zero, ax])  # [lin; ang]
    return jnp.concatenate([ax, zero])


def joint_child_poses(robot: Robot, angles):
    """angles (..., dof) -> list of (..., 3, 4) poses of each joint's child
    frame, in joint index order (parents first by construction)."""
    poses: List = []
    for spec in robot.joints:
        theta = angles[..., spec.dof_index]
        if spec.mimic_of is not None:
            theta = spec.mimic_mult * theta + spec.mimic_off
        motion = _joint_motion(spec.kind, spec.axis, theta)
        local = se3.compose(jnp.asarray(spec.origin, dtype=angles.dtype), motion)
        if spec.parent_joint is None:
            poses.append(local)
        else:
            poses.append(se3.compose(poses[spec.parent_joint], local))
    return poses


def get_forward_kinematics_fns(robot: Robot, link_names: Sequence[str]):
    """Returns (fk, jfk_b, jfk_s) (reference forward_kinematics.py:128-179).

    fk(angles (..., dof)) -> tuple of (..., 3, 4) link poses;
    jfk_b/jfk_s(angles) -> (list of (..., 6, dof) jacobians, poses)."""
    link_names = list(link_names)
    offsets = [np.asarray(robot.link_offset(l)) for l in link_names]
    parents = [robot.link_parent_joint(l) for l in link_names]
    ancestors = [robot.ancestor_joints(l) for l in link_names]

    def fk(angles):
        jp = joint_child_poses(robot, angles)
        out = []
        for off, pj in zip(offsets, parents):
            off_t = jnp.asarray(off, dtype=angles.dtype)
            if pj is None:
                out.append(jnp.broadcast_to(off_t, angles.shape[:-1] + (3, 4)))
            else:
                out.append(se3.compose(jp[pj], off_t))
        return tuple(out)

    def _jfk(angles, spatial: bool):
        jp = joint_child_poses(robot, angles)
        poses = []
        jacs = []
        batch = angles.shape[:-1]
        for off, pj, anc in zip(offsets, parents, ancestors):
            off_t = jnp.asarray(off, dtype=angles.dtype)
            pose = (
                jnp.broadcast_to(off_t, batch + (3, 4))
                if pj is None
                else se3.compose(jp[pj], off_t)
            )
            poses.append(pose)
            cols = [
                jnp.zeros(batch + (6,), dtype=angles.dtype)
            ] * robot.dof
            pose_inv = se3.inverse(pose)
            for ji in anc:
                spec = robot.joints[ji]
                xi = _screw(spec.kind, spec.axis, angles.dtype)
                if spatial:
                    adj = se3.adjoint(jp[ji])
                else:
                    adj = se3.adjoint(se3.compose(pose_inv, jp[ji]))
                col = jnp.einsum("...ij,j->...i", adj, xi)
                if spec.mimic_of is not None:
                    col = spec.mimic_mult * col  # chain rule through the mimic map
                # accumulate (a mimic joint shares its target's dof column)
                cols[spec.dof_index] = cols[spec.dof_index] + col
            jacs.append(jnp.stack(cols, axis=-1))
        return jacs, tuple(poses)

    def jfk_b(angles):
        return _jfk(angles, spatial=False)

    def jfk_s(angles):
        return _jfk(angles, spatial=True)

    return fk, jfk_b, jfk_s
