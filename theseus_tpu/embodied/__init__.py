from .collision import (
    Collision2D,
    EffectorObjectContactPlanar,
    occupancy_to_sdf,
    sdf_signed_distance,
)
from .kinematics import IdentityModel, KinematicsModel, UrdfRobotModel
from .measurements import Between, MovingFrameBetween, Reprojection
from .misc import Difference, Local
from .motionmodel import (
    DoubleIntegrator,
    GPCostWeight,
    GPMotionModel,
    HingeCost,
    Nonholonomic,
    QuasiStaticPushingPlanar,
)
