"""Quadratic curve fitting with a differentiable NLLS layer.

The hello-world of the framework (reference examples/simple_example.py):
fit y = a x^2 + b per batch element with Gauss-Newton, then learn a data
scale by differentiating through the solve."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt


def main():
    rng = np.random.RandomState(0)
    batch, npts = 4, 40
    x = jnp.asarray(rng.uniform(-1, 1, (batch, npts)))
    ab_true = jnp.asarray(rng.uniform(0.5, 2.0, (batch, 2)))
    y = ab_true[:, :1] * x**2 + ab_true[:, 1:]

    ab = tt.Vector(2, name="ab")
    xv = tt.Variable(x, name="x")
    yv = tt.Variable(y, name="y")

    def err_fn(optim, aux):
        (ab,) = optim
        xx, yy = aux
        return yy - (ab[0] * xx**2 + ab[1])

    objective = tt.Objective()
    objective.add(tt.AutoDiffCostFunction([ab], npts, err_fn, aux_vars=[xv, yv]))
    optimizer = tt.GaussNewton(objective, max_iterations=15)
    layer = tt.TheseusLayer(optimizer)

    values, info = layer.forward({"ab": jnp.zeros((batch, 2))})
    print("estimated a, b:\n", np.asarray(values["ab"]))
    print("true      a, b:\n", np.asarray(ab_true))
    print("status:", np.asarray(info.status), "iters:", np.asarray(info.converged_iter))

    # differentiate through the solve (implicit mode): d(sum ab*)/d(theta)
    co = objective.compile()

    def outer(theta):
        vals = objective.default_values({"ab": jnp.zeros((batch, 2)), "y": theta * y})
        state = co.pack(vals, batch)
        aux = co.build_aux(vals, batch)
        carry = layer.solve_state(state, aux, "implicit", optimizer.opts)
        return jnp.sum(co.unpack(carry["state"])["ab"])

    print("outer grad:", float(jax.grad(outer)(1.0)))


if __name__ == "__main__":
    main()
