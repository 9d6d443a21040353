# %% [markdown]
# # Tutorial 2: Differentiating through the layer
#
# (port of the reference's tutorials/02_differentiating_theseus_layer.ipynb)
#
# The point of a *differentiable* NLLS layer: outer-loop parameters (data,
# weights, measurement models) receive gradients THROUGH the inner
# optimization. Four backward modes are available
# (reference nonlinear_optimizer.py:20):
#
# - **unroll**: reverse-mode through every inner iteration. Exact for the
#   computation actually performed; memory/compile scale with iterations.
# - **implicit**: implicit-function-theorem adjoint — one extra
#   detached-Hessian Gauss-Newton step at the solution carries all the
#   gradient. O(1) in iterations; assumes the solve reached its fixed
#   point (and inherits the Gauss-Newton Hessian approximation on
#   nonzero-residual problems, see evaluations/results_backward_modes.md).
# - **truncated**: unroll only the last K iterations.
# - **dlm**: direct loss minimization via a perturbed objective
#   (reference theseus_layer.py:177).
#
# We fit y = a*x^2 + b and learn the data parameter by gradient descent —
# the reference's tutorial example.

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

xs = jnp.linspace(-1.0, 1.0, 20)[None]
a_true, b_true = 3.0, -1.0
ys_clean = a_true * xs**2 + b_true

ab = tt.Vector(dof=2, name="ab")
x_var = tt.Variable(xs, name="xs")
y_var = tt.Variable(ys_clean, name="ys")


def residual(optim, aux):
    (ab,) = optim
    x, y = aux
    return ab[0] * x**2 + ab[1] - y


obj = tt.Objective()
obj.add(tt.AutoDiffCostFunction([ab], 20, residual, aux_vars=[x_var, y_var],
                                name="fit"))
opt = tt.GaussNewton(obj, max_iterations=8)
layer = tt.TheseusLayer(opt)

# %% [markdown]
# ## Gradients with jax.grad
#
# The functional route: pack values into state/aux pytrees and call
# `layer.solve_state` inside your own jit/grad. Here the outer parameter is
# the observation vector `ys`; the outer loss asks the recovered `a` to hit
# a target value.

# %%
co = obj.compile()


def outer_loss(ys, mode):
    values = {"ab": jnp.zeros((1, 2)), "xs": xs, "ys": ys}
    state = co.pack(values, 1)
    aux = co.build_aux(values, 1)
    carry = layer.solve_state(state, aux, mode, opt.opts,
                              backward_num_iterations=3)
    ab_star = co.unpack(carry["state"])["ab"]
    return (ab_star[0, 0] - 5.0) ** 2  # want the fitted a to equal 5


for mode in ("unroll", "implicit", "truncated", "dlm"):
    g = jax.grad(lambda y: outer_loss(y, mode))(ys_clean)
    print(f"{mode:10s} d loss/d ys[0, :3] = {g[0, :3]}")

# %% [markdown]
# All four agree on this zero-residual problem. Now use the gradient: learn
# observations that make the inner solve produce a = 5.

# %%
ys = ys_clean
loss_grad = jax.jit(jax.value_and_grad(lambda y: outer_loss(y, "implicit")))
for i in range(40):
    loss, g = loss_grad(ys)
    ys = ys - 0.5 * g
print("final outer loss:", float(loss))
assert float(loss) < 1e-3
print("tutorial 02 OK")
