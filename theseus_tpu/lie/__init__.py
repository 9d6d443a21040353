"""Functional Lie-group layer (the torchlie equivalent, TPU-native)."""

from . import rn, se2, se3, so2, so3, utils
from .group import SE2, SE3, SO2, SO3, Group, Point2, Point3, by_name, euclidean
from .checks import enable_checks, no_lie_group_check, set_lie_group_check_enabled
from .lie_array import LieArray

__all__ = [
    "rn",
    "se2",
    "se3",
    "so2",
    "so3",
    "utils",
    "Group",
    "SO2",
    "SE2",
    "SO3",
    "SE3",
    "Point2",
    "Point3",
    "euclidean",
    "by_name",
    "LieArray",
]
