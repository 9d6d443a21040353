"""theseus_tpu: TPU-native differentiable nonlinear least squares.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
facebookresearch/theseus (differentiable NLLS layer over manifold-valued
variables). See SURVEY.md at the repo root for the reference layer map.

Naming parity: `theseus_tpu.SE3(...)` etc. construct *variables* (like
`th.SE3`); the functional Lie ops live under `theseus_tpu.lie` (like
`torchlie.functional`).
"""

from . import lie
from .config import set_global_params
from .core import (
    AutoDiffCostFunction,
    CostFunction,
    CostWeight,
    DiagonalCostWeight,
    GemanMcClureLoss,
    HingeLoss,
    HuberLoss,
    ManifoldVariable,
    Objective,
    RobustCostFunction,
    ScaleCostWeight,
    Variable,
    WelschLoss,
    as_variable,
)
from .core import SE2, SE3, SO2, SO3, Point2, Point3, Vector
from .layer import TheseusLayer
from .embodied import (
    Between,
    Collision2D,
    Difference,
    DoubleIntegrator,
    EffectorObjectContactPlanar,
    GPCostWeight,
    GPMotionModel,
    HingeCost,
    IdentityModel,
    Local,
    MovingFrameBetween,
    Nonholonomic,
    QuasiStaticPushingPlanar,
    Reprojection,
    UrdfRobotModel,
)
from .optim import (
    DenseCholeskySolver,
    DenseLUSolver,
    Dogleg,
    GaussNewton,
    LevenbergMarquardt,
    NonlinearOptimizerStatus,
    OptimizerInfo,
)

__version__ = "0.1.0"
