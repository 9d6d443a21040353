from .compiled import CompiledObjective, compile_objective
from .cost_function import (
    AutoDiffCostFunction,
    CostFunction,
    GNCRobustCostFunction,
    RobustCostFunction,
)
from .cost_weight import CostWeight, DiagonalCostWeight, ScaleCostWeight
from .objective import Objective
from .robust_loss import GemanMcClureLoss, HingeLoss, HuberLoss, WelschLoss
from .variable import (
    SE2,
    SE3,
    SO2,
    SO3,
    ManifoldVariable,
    Point2,
    Point3,
    Variable,
    Vector,
    as_variable,
)
from .family import (
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
