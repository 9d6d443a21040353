from .linear import DenseCholeskySolver, DenseLUSolver, apply_damping
from .nonlinear import (
    Dogleg,
    GaussNewton,
    LevenbergMarquardt,
    NLSOptions,
    NonlinearLeastSquares,
    NonlinearOptimizerStatus,
    OptimizerInfo,
)
