from . import examples
from .checks import (
    autodiff_jacobian,
    build_mlp,
    check_jacobians,
    gather_from_rows_cols,
    numeric_jacobian,
)
from .hoist import hoist_jit
from .host import local_cpu, on_host, to_device
from .timer import Profiler, Timer, fresh_eps
