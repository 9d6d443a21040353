"""theseus_tpu: TPU-native differentiable nonlinear least squares.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
facebookresearch/theseus (differentiable NLLS layer over manifold-valued
variables). See SURVEY.md at the repo root for the reference layer map.

Naming parity: `theseus_tpu.SE3(...)` etc. construct *variables* (like
`th.SE3`); the functional Lie ops live under `theseus_tpu.lie` (like
`torchlie.functional`).
"""

import jax as _jax

# On TPU, f32 matmuls default to bf16 MXU passes. For a second-order-solver /
# Lie-geometry library this is wrong-by-default: chained 3x3/3x4 composes
# drift off the manifold and J^T J systems lose the digits Cholesky needs
# (observed: PGO convergence collapse). The matmuls here are tiny, so full
# f32 costs little; users who want bf16 in their own cost models can pass
# explicit `precision=` there.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import lie
from .config import set_global_params
from .core import (
    AutoDiffCostFunction,
    CostFunction,
    CostWeight,
    DiagonalCostWeight,
    GemanMcClureLoss,
    GNCRobustCostFunction,
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
    DCEM,
    DenseCholeskySolver,
    DenseLUSolver,
    Dogleg,
    GaussNewton,
    LevenbergMarquardt,
    LinearOptimizer,
    NonlinearOptimizerStatus,
    OptimizerInfo,
    VariableOrdering,
)
from .optim.gaussian import ManifoldGaussian, local_gaussian, retract_gaussian

__version__ = "0.1.0"
