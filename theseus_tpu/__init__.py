"""theseus_tpu: TPU-native differentiable nonlinear least squares.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
facebookresearch/theseus (differentiable NLLS layer over manifold-valued
variables). See SURVEY.md at the repo root for the reference layer map.
"""

from . import lie
from .config import set_global_params
from .lie import SE2, SE3, SO2, SO3, Point2, Point3, euclidean

__version__ = "0.1.0"
