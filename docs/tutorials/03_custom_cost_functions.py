# %% [markdown]
# # Tutorial 3: Custom cost functions
#
# (port of the reference's tutorials/03_custom_cost_functions.ipynb)
#
# Two ways to add residuals:
#
# 1. **AutoDiffCostFunction** — write the residual as a pure function;
#    tangent-space jacobians come from autodiff (this covers almost all
#    uses; the compiler fuses identical instances and batches them).
# 2. **Subclassing CostFunction with analytic jacobians** — when you have
#    closed-form derivatives (the reference's `jacobians()` override).
#    `jacobians_impl` returns right-tangent-space jacobians: d r / d delta
#    at delta = 0 of r(x retract delta).
#
# `check_jacobians` verifies analytic jacobians against autodiff.

# %%
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp

import theseus_tpu as tt
from theseus_tpu.utils.checks import check_jacobians

# %% [markdown]
# ## A custom SO3 cost with analytic jacobians
#
# Residual: log(R_target^-1 R) — the tangent distance to a target rotation.
# Its right-tangent jacobian w.r.t. R is the inverse right-Jacobian of the
# log, which the lie layer exposes; here we use the well-known small-angle
# form to keep the example readable, and verify it numerically.

# %%
from theseus_tpu.lie import so3


class SO3Prior(tt.CostFunction):
    has_analytic_jacobians = True

    def __init__(self, rot, target, weight=None, name=None):
        super().__init__([rot], [tt.as_variable(target, name="so3_target")],
                         weight, name)

    def dim(self):
        return 3

    def error_impl(self, optim, aux):
        (r,) = optim
        (target,) = aux
        return so3.log(so3.compose(so3.inverse(target), r))

    def jacobians_impl(self, optim, aux):
        (r,) = optim
        (target,) = aux
        # d log(T^-1 R exp(d))/dd at d=0 = Jr^{-1}(err), the right-inverse
        # jacobian of log — exposed analytically as so3.jlog
        (jac,), err = so3.jlog(so3.compose(so3.inverse(target), r))
        return [jac], err


rot = tt.SO3(name="rot")
target = so3.exp(jnp.asarray([[0.3, -0.2, 0.5]]))
cost = SO3Prior(rot, target, tt.ScaleCostWeight(1.0), name="prior")
check_jacobians(cost, num_checks=3, tol=1e-6)
print("analytic jacobians verified against autodiff")

# %% [markdown]
# ## Using it

# %%
obj = tt.Objective()
obj.add(cost)
opt = tt.GaussNewton(obj, max_iterations=6)
layer = tt.TheseusLayer(opt)
sol, info = layer.forward({"rot": jnp.eye(3)[None]})
import numpy as np

np.testing.assert_allclose(np.asarray(sol["rot"]), np.asarray(target),
                           atol=1e-6)

# %% [markdown]
# ## Robust costs
#
# Wrap any cost with a robust loss (Welsch/Huber/GemanMcClure/Hinge) to
# downweight outliers; `GNCRobustCostFunction` adds graduated non-convexity
# annealing (reference robust_cost_function.py:51,176).

# %%
x = tt.Vector(dof=1, name="x")
data = jnp.concatenate(
    [jnp.full((1, 9), 1.0), jnp.full((1, 1), 50.0)], axis=-1)  # one outlier


def res(optim, aux):
    (x,) = optim
    (d,) = aux
    return x - d


base = tt.AutoDiffCostFunction([x], 10, res,
                               aux_vars=[tt.Variable(data, name="data")],
                               name="fit")
robust = tt.RobustCostFunction(base, tt.WelschLoss,
                               jnp.full((1, 1), 0.0), flatten_dims=True,
                               name="fit_robust")
obj2 = tt.Objective()
obj2.add(robust)
opt2 = tt.LevenbergMarquardt(obj2, max_iterations=20, adaptive_damping=True)
sol2, _ = tt.TheseusLayer(opt2).forward({"x": jnp.ones((1, 1))})
print("robust estimate (true inliers at 1.0):", sol2["x"])
assert abs(float(sol2["x"][0, 0]) - 1.0) < 0.1
print("tutorial 03 OK")
