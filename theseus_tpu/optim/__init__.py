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
from .dcem import DCEM, DCEMOptions
from .gaussian import ManifoldGaussian, local_gaussian, retract_gaussian
from .gbp import GaussianBeliefPropagation, GBPOptions
from .lml import lml
from .ordering import VariableOrdering
