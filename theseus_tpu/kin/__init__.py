from .fk import get_forward_kinematics_fns, joint_child_poses
from .robot import Robot
from .urdf import parse_urdf
