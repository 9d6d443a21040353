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

# Persistent XLA compilation cache: compiles are the dominant setup cost on
# remote-attached TPU backends (measured ~0.5 s per tiny eager op, ~100 s for
# a mid-sized program over the tunnel), and solver programs recur across
# processes. Opt out by setting THESEUS_TPU_NO_CACHE.
import os as _os

if not _os.environ.get("THESEUS_TPU_NO_CACHE"):
    # namespaced per platform selection: AOT cache entries are
    # machine-specific, and this process's artifacts must not be offered to
    # a process running against a different backend (observed: remote-host
    # CPU AOT entries SIGILL-warning on the local CPU)
    _plat = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "_")
    # the axon remote plugin offloads even CPU-platform compiles to the
    # remote host, whose AOT artifacts are invalid locally — keep those runs
    # in their own namespace
    if _os.environ.get("PALLAS_AXON_POOL_IPS"):
        _plat += "_remote"
    _cache = _os.environ.get(
        "THESEUS_TPU_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", f"theseus_tpu_jax_{_plat}"
        ),
    )
    try:
        if not _jax.config.jax_compilation_cache_dir:  # respect prior config
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
    except Exception:
        pass

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
from .core import (
    CostFamily,
    Point2Family,
    Point3Family,
    SE2Family,
    SE3Family,
    SO2Family,
    SO3Family,
    VariableFamily,
    VectorFamily,
)
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
    GaussianBeliefPropagation,
    GaussNewton,
    LevenbergMarquardt,
    LinearOptimizer,
    NonlinearLeastSquares,
    NonlinearOptimizerStatus,
    OptimizerInfo,
    VariableOrdering,
)
from .optim.gaussian import ManifoldGaussian, local_gaussian, retract_gaussian
from .core.functional import (
    adjoint,
    between,
    compose,
    exp_map,
    inverse,
    local,
    log_map,
    rand_point2,
    rand_point3,
    rand_se2,
    rand_se3,
    rand_so2,
    rand_so3,
    rand_vector,
    randn_point2,
    randn_point3,
    randn_se2,
    randn_se3,
    randn_so2,
    randn_so3,
    randn_vector,
    retract,
)
from .lie.checks import (
    enable_lie_group_check,
    no_lie_group_check,
    set_lie_group_check_enabled,
)

__version__ = "0.1.0"
