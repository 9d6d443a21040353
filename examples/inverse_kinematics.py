"""Inverse kinematics via NLLS over joint angles (reference
examples/inverse_kinematics.py): the residual is the local() difference
between the FK end-effector pose and a target SE3 pose."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import _config
import theseus_tpu as tt
from theseus_tpu import lie
from theseus_tpu.kin import Robot, get_forward_kinematics_fns

PANDA_ISH = """
<robot name="arm5">
  <link name="base"/> <link name="l1"/> <link name="l2"/>
  <link name="l3"/> <link name="l4"/> <link name="ee"/>
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
    <parent link="l3"/><child link="l4"/>
    <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j5" type="revolute">
    <parent link="l4"/><child link="ee"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
  </joint>
</robot>
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--max-iterations", type=int, default=50)
    p.add_argument("--target-joints", type=float, nargs=5,
                   default=[0.4, -0.6, 0.8, 0.3, -0.5])
    args = _config.parse_with_config(p, argv)

    robot = Robot.from_urdf_string(PANDA_ISH)
    fk, jfk_b, _ = get_forward_kinematics_fns(robot, ["ee"])

    # target pose from a known joint configuration
    theta_target = jnp.asarray(args.target_joints)
    (target_pose,) = fk(theta_target)

    theta_var = tt.Vector(robot.dof, name="theta")
    target = tt.Variable(target_pose[None], name="target")

    def ik_err(optim, aux):
        (th,) = optim
        (tgt,) = aux
        (pose,) = fk(th)
        return lie.SE3.local(tgt, pose)

    obj = tt.Objective()
    obj.add(tt.AutoDiffCostFunction([theta_var], 6, ik_err, aux_vars=[target], name="ik"))
    opt = tt.LevenbergMarquardt(obj, max_iterations=args.max_iterations,
                                adaptive_damping=True)
    layer = tt.TheseusLayer(opt)

    values, info = layer.forward({"theta": jnp.zeros((1, robot.dof))})
    (sol_pose,) = fk(values["theta"][0])
    err = np.abs(np.asarray(lie.SE3.local(target_pose, sol_pose)))
    print("solved joints:", np.asarray(values["theta"])[0])
    print("pose error:", err, "status:", np.asarray(info.status))
    assert err.max() < 1e-4


if __name__ == "__main__":
    main()
