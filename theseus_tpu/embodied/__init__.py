from .measurements import Between, MovingFrameBetween, Reprojection
from .misc import Difference, Local
