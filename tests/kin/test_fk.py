"""Forward-kinematics tests: analytic body/spatial jacobians vs autodiff,
fixed-joint folding, batching, and a hand-checked 2-link planar arm."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu import lie
from theseus_tpu.kin import Robot, get_forward_kinematics_fns

ARM_URDF = """
<robot name="arm2">
  <link name="base"/>
  <link name="l1"/>
  <link name="l2"/>
  <link name="tool"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.5"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="1 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14"/>
  </joint>
  <joint name="ee_fixed" type="fixed">
    <parent link="l2"/><child link="tool"/>
    <origin xyz="1 0 0" rpy="0 0 0"/>
  </joint>
</robot>
"""

MIXED_URDF = """
<robot name="mix">
  <link name="base"/>
  <link name="a"/>
  <link name="b"/>
  <link name="c"/>
  <joint name="jz" type="prismatic">
    <parent link="base"/><child link="a"/>
    <origin xyz="0 0 0.1" rpy="0.3 0 0"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="jr" type="revolute">
    <parent link="a"/><child link="b"/>
    <origin xyz="0.2 0 0" rpy="0 0.4 0"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="jx" type="revolute">
    <parent link="b"/><child link="c"/>
    <origin xyz="0 0.3 0" rpy="0 0 1.1"/><axis xyz="1 0 0"/>
  </joint>
</robot>
"""


def test_two_link_planar_positions():
    robot = Robot.from_urdf_string(ARM_URDF)
    assert robot.dof == 2
    fk, _, _ = get_forward_kinematics_fns(robot, ["tool"])
    th = jnp.asarray([math.pi / 2, -math.pi / 2], jnp.float64)
    (tool,) = fk(th)
    # j1 rotates +90deg: l2 origin at (0,1,0.5); j2 -90: tool extends +x of l2
    # frame which now points +x world => tool at (1, 1, 0.5)
    np.testing.assert_allclose(tool[:, 3], [1.0, 1.0, 0.5], atol=1e-12)


@pytest.mark.parametrize("urdf", [ARM_URDF, MIXED_URDF], ids=["arm2", "mixed"])
def test_jacobians_match_autodiff(urdf):
    robot = Robot.from_urdf_string(urdf)
    links = [robot.joints[-1].child_link]
    fk, jfk_b, jfk_s = get_forward_kinematics_fns(robot, links)
    key = jax.random.PRNGKey(0)
    th = jax.random.normal(key, (robot.dof,), dtype=jnp.float64)

    jacs, (pose,) = jfk_b(th)
    jacs_s, (pose_s,) = jfk_s(th)
    np.testing.assert_allclose(pose, pose_s, atol=1e-12)

    # autodiff ground truth: d/d eps local(pose(th), pose(th + eps e_i))
    def local_fn(th2):
        (p2,) = fk(th2)
        return lie.SE3.local(pose, p2)

    num = jax.jacfwd(local_fn)(th)
    np.testing.assert_allclose(jacs[0], num, atol=1e-9)
    # spatial = Adj(pose) @ body
    np.testing.assert_allclose(
        jacs_s[0], lie.se3.adjoint(pose) @ jacs[0], atol=1e-9
    )


def test_fk_batched_and_jit():
    robot = Robot.from_urdf_string(MIXED_URDF)
    fk, jfk_b, _ = get_forward_kinematics_fns(robot, ["c", "a"])
    th = jax.random.normal(jax.random.PRNGKey(1), (4, 7, robot.dof), dtype=jnp.float64)
    poses = jax.jit(fk)(th)
    assert poses[0].shape == (4, 7, 3, 4)
    jacs, _ = jax.jit(lambda t: jfk_b(t))(th)
    assert jacs[0].shape == (4, 7, 6, robot.dof)
    # spot check one element vs unbatched
    (p_single,) = (get_forward_kinematics_fns(robot, ["c"])[0])(th[2, 3])
    np.testing.assert_allclose(poses[0][2, 3], p_single, atol=1e-12)


def test_fixed_joint_folding():
    robot = Robot.from_urdf_string(ARM_URDF)
    assert "tool" in robot._offset_of_link
    fk, _, _ = get_forward_kinematics_fns(robot, ["l2", "tool"])
    th = jnp.zeros(2, jnp.float64)
    l2, tool = fk(th)
    np.testing.assert_allclose(tool[:, 3] - l2[:, 3], [1, 0, 0], atol=1e-12)
