# %% [markdown]
# # Tutorial 0: An introduction to theseus_tpu
#
# (runnable script port of the reference's tutorials/00_introduction.ipynb,
# re-designed for the TPU-native JAX architecture)
#
# theseus_tpu solves **differentiable nonlinear least-squares (DNLS)**
# problems: given manifold-valued variables x and weighted residual "cost
# functions" r_i(x), it minimizes 0.5 * sum_i ||w_i r_i(x)||^2 with a
# second-order optimizer, and the whole solve is differentiable so it can
# sit inside a learning loop.
#
# The core concepts, bottom-up:
# - **Variable**: a named tensor. Auxiliary variables hold data (targets,
#   measurements); `ManifoldVariable`s are the optimized unknowns and live
#   on a manifold (Vector, Point2/3, SO2/3, SE2/3).
# - **CostFunction**: a residual over optim vars + aux vars, with a
#   CostWeight.
# - **Objective**: the collection of cost functions (the problem graph).
# - **Optimizer + TheseusLayer**: the inner solver and its differentiable
#   module wrapper.
#
# Everything numerical is a pure function of a `{name: array}` dict — data
# has a leading batch dimension B everywhere, and batch-1 arrays broadcast.

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

# %% [markdown]
# ## Variables
#
# A Variable is a *spec*: a name plus (optionally) a default tensor.
# Per-call data flows through the values dict, so the same Objective can be
# reused with new data without rebuilding anything.

# %%
x = tt.Vector(dof=2, name="x")          # an optimization variable in R^2
target = tt.Variable(jnp.asarray([[1.0, 2.0]]), name="target")  # aux data
print(x, target)

# %% [markdown]
# Manifold variables know their group:

# %%
pose = tt.SE3(name="pose")  # 3x4 [R|t] matrices, dof 6
rot = tt.SO3(name="rot")    # 3x3 rotations, dof 3
print(pose.group.name, pose.group.dof, rot.group.shape)

# %% [markdown]
# ## Cost functions and weights
#
# The built-in `Local` (the reference's `Difference`) penalizes the
# tangent-space distance between a variable and a target. Weights multiply
# residuals (sqrt-precision convention): `ScaleCostWeight` is a scalar,
# `DiagonalCostWeight` a per-dimension vector.

# %%
cost = tt.Local(x, target, tt.ScaleCostWeight(2.0), name="pull_to_target")
print(cost, "residual dim:", cost.dim())

# %% [markdown]
# ## The Objective and its error

# %%
obj = tt.Objective()
obj.add(cost)
values = obj.default_values({"x": jnp.zeros((1, 2))})
print("error vector:", obj.error(values=values))       # (B, dim)
print("error metric:", obj.error_metric(values=values))  # 0.5*||e||^2

# %% [markdown]
# ## Solving
#
# Wrap an optimizer in a TheseusLayer and call forward() with input data.
# The solution comes back as a values dict plus an info object.

# %%
opt = tt.GaussNewton(obj, max_iterations=5)
layer = tt.TheseusLayer(opt)
solution, info = layer.forward({"x": jnp.zeros((1, 2))})
print("x* =", solution["x"], " (target was [1, 2])")
print("converged best error:", info.best_err)

# %% [markdown]
# Batching is automatic: feed (B, ...) arrays and every batch element is
# solved independently (one fused computation on the device).

# %%
solution, info = layer.forward(
    {"x": jnp.zeros((3, 2)), "target": jnp.asarray([[1.0, 2], [3, 4], [5, 6]])}
)
print("batched solutions:\n", solution["x"])

assert jnp.allclose(solution["x"][2], jnp.asarray([5.0, 6.0]), atol=1e-6)
print("tutorial 00 OK")
