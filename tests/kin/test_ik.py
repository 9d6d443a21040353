"""Inverse kinematics through the layer (reference embodied/kinematics/
test_inverse_kinematics.py::test_ik_optimization): batched IK converges to
the target EE pose and the outer gradient flows through the FK cost."""

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu import lie
from theseus_tpu.kin import Robot, get_forward_kinematics_fns

URDF = """
<robot name="arm4">
  <link name="base"/> <link name="l1"/> <link name="l2"/>
  <link name="l3"/> <link name="ee"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0 0 0.3"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="j4" type="revolute">
    <parent link="l3"/><child link="ee"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
  </joint>
</robot>
"""


def _setup(batch=2):
    robot = Robot.from_urdf_string(URDF)
    fk, _, _ = get_forward_kinematics_fns(robot, ["ee"])
    theta_gt = jnp.asarray(
        [[0.4, -0.6, 0.8, 0.3], [-0.2, 0.5, -0.7, 0.9]][:batch],
        jnp.float64,
    )
    targets = jax.vmap(lambda th: fk(th)[0])(theta_gt)  # (B, 3, 4)

    theta_var = tt.Vector(robot.dof, name="theta")
    target = tt.Variable(targets, name="target")

    def ik_err(optim, aux):
        (th,) = optim
        (tgt,) = aux
        (pose,) = fk(th)
        return lie.SE3.local(tgt, pose)

    obj = tt.Objective(dtype=jnp.float64)
    obj.add(
        tt.AutoDiffCostFunction(
            [theta_var], 6, ik_err, aux_vars=[target], name="ik"
        )
    )
    opt = tt.LevenbergMarquardt(obj, max_iterations=40, adaptive_damping=True)
    return tt.TheseusLayer(opt), fk, targets, robot


def test_batched_ik_converges():
    layer, fk, targets, robot = _setup(batch=2)
    # start near-but-off the solutions (a zero init can fall into a
    # different basin for the second configuration; the reference's IK test
    # likewise perturbs around a feasible pose)
    init = jnp.asarray(
        [[0.4, -0.6, 0.8, 0.3], [-0.2, 0.5, -0.7, 0.9]], jnp.float64
    ) + 0.25
    values, info = layer.forward({"theta": init})
    poses = jax.vmap(lambda th: fk(th)[0])(values["theta"])
    err = np.abs(np.asarray(jax.vmap(lie.SE3.local)(targets, poses)))
    assert err.max() < 1e-6
    assert np.all(np.asarray(info.status) == tt.NonlinearOptimizerStatus.CONVERGED)


def test_ik_outer_gradient_flows():
    """d(loss of solved joints)/d(target pose) via implicit mode: finite,
    nonzero, and consistent with a finite-difference probe."""
    layer, fk, targets, robot = _setup(batch=1)

    def solve(tgt):
        out, _ = layer.forward(
            {"theta": jnp.zeros((1, robot.dof), jnp.float64),
             "target": tgt},
            {"backward_mode": "implicit"},
        )
        return jnp.sum(out["theta"] ** 2)

    g = jax.grad(solve)(targets[:1])
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 1e-6

    # FD probe along one tangent direction of the target
    eps = 1e-6
    direction = jnp.zeros((1, 6), jnp.float64).at[0, 1].set(1.0)
    tp = lie.SE3.retract(targets[:1], eps * direction)
    tm = lie.SE3.retract(targets[:1], -eps * direction)
    fd = (float(solve(tp)) - float(solve(tm))) / (2 * eps)
    # project raw-coordinate gradient onto the same tangent direction
    jvp = jax.jvp(
        lambda t: lie.SE3.retract(targets[:1], t), (jnp.zeros((1, 6), jnp.float64),),
        (direction,),
    )[1]
    got = float(jnp.sum(jnp.asarray(g) * jvp))
    np.testing.assert_allclose(got, fd, rtol=1e-4, atol=1e-8)
