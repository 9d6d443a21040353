from .linear import DenseCholeskySolver, DenseLUSolver, apply_damping
from .nonlinear import (
    GaussNewton,
    LevenbergMarquardt,
    NLSOptions,
    NonlinearLeastSquares,
    NonlinearOptimizerStatus,
    OptimizerInfo,
)
