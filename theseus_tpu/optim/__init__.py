from .linear import DenseCholeskySolver, DenseLUSolver, apply_damping
from .nonlinear import (
    Dogleg,
    GaussNewton,
    LinearOptimizer,
    LevenbergMarquardt,
    NLSOptions,
    NonlinearLeastSquares,
    NonlinearOptimizerStatus,
    OptimizerInfo,
)
