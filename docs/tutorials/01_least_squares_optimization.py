# %% [markdown]
# # Tutorial 1: Nonlinear least-squares optimization
#
# (port of the reference's tutorials/01_least_squares_optimization.ipynb)
#
# We fit a curve y = a * exp(b * x) to noisy data — the classic NLLS demo —
# and tour the optimizer options: Gauss-Newton vs Levenberg-Marquardt vs
# Dogleg, dense vs sparse linear solvers, damping, and the info object.

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

key = jax.random.PRNGKey(0)
a_true, b_true = 2.0, 0.7
xs = jnp.linspace(0.0, 1.0, 30)[None]              # (1, N)
ys = a_true * jnp.exp(b_true * xs)
ys = ys + 0.01 * jax.random.normal(key, ys.shape)  # noisy observations

# %% [markdown]
# ## An AutoDiffCostFunction
#
# The residual is written as a pure per-batch-element function over
# single-instance arrays; jacobians come from autodiff in the tangent space
# (no hand-derived derivatives needed). `dim` is the residual length.

# %%
ab = tt.Vector(dof=2, name="ab")


def residual(optim, aux):
    (ab,) = optim
    x, y = aux
    return ab[0] * jnp.exp(ab[1] * x) - y


obj = tt.Objective()
obj.add(
    tt.AutoDiffCostFunction(
        [ab], 30, residual,
        aux_vars=[tt.Variable(xs, name="xs"), tt.Variable(ys, name="ys")],
        name="curve_fit",
    )
)

# %% [markdown]
# ## Optimizers
#
# - `GaussNewton`: plain GN steps.
# - `LevenbergMarquardt`: damped steps; `adaptive_damping=True` adjusts the
#   damping per batch element from the gain ratio (rejecting bad steps).
# - `Dogleg`: trust-region interpolation between the GN and steepest
#   descent steps.
#
# `linearization="dense"` materializes the full jacobian (right for small
# dof); `"sparse"` builds block-sparse normal equations and runs the
# batched block-sparse Cholesky (right for graph-structured problems like
# pose graphs); `"schur"` eliminates designated variables in closed form
# (right for bundle adjustment).

# %%
for opt_cls, kw in [
    (tt.GaussNewton, {}),
    (tt.LevenbergMarquardt, dict(adaptive_damping=True)),
    (tt.Dogleg, {}),
]:
    opt = opt_cls(obj, max_iterations=15, **kw)
    layer = tt.TheseusLayer(opt)
    sol, info = layer.forward({"ab": jnp.asarray([[1.0, 0.0]])})
    print(f"{opt_cls.__name__:20s} ab* = {sol['ab'][0]}  "
          f"best_err = {float(info.best_err[0]):.3e}")

# %% [markdown]
# ## The info object
#
# Per-batch status, best error, and (optionally) error history:

# %%
opt = tt.LevenbergMarquardt(obj, max_iterations=15, adaptive_damping=True,
                            track_err_history=True)
layer = tt.TheseusLayer(opt)
sol, info = layer.forward({"ab": jnp.asarray([[1.0, 0.0]])})
print("status:", info.status)
print("err history (first 6):", jnp.asarray(info.err_history)[:6, 0])

import numpy as np

assert np.abs(np.asarray(sol["ab"][0]) - np.asarray([a_true, b_true])).max() < 0.1
print("tutorial 01 OK")
