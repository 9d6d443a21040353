"""Compare backward modes (reference examples/backward_modes.py): gradients
of the solution of a curve fit wrt a data parameter under unroll / implicit /
truncated / dlm, timed, against finite differences."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt


def main():
    rng = np.random.RandomState(0)
    batch, npts = 2, 25
    x = jnp.asarray(rng.uniform(-1, 1, (batch, npts)))
    ab_true = jnp.asarray(rng.uniform(0.5, 2.0, (batch, 2)))
    y = ab_true[:, :1] * x**2 + ab_true[:, 1:]

    ab = tt.Vector(2, name="ab")
    xv, yv = tt.Variable(x, name="x"), tt.Variable(y, name="y")

    def err_fn(optim, aux):
        (ab,) = optim
        xx, yy = aux
        return yy - (ab[0] * xx**2 + ab[1])

    obj = tt.Objective()
    obj.add(tt.AutoDiffCostFunction([ab], npts, err_fn, aux_vars=[xv, yv]))
    opt = tt.GaussNewton(obj, max_iterations=12)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values({"ab": jnp.zeros((batch, 2))})
    state = co.pack(values, batch)

    def make_loss(mode):
        def f(theta):
            vals = dict(values)
            vals["y"] = theta * y
            aux = co.build_aux(vals, batch)
            carry = layer.solve_state(state, aux, mode, opt.opts, 4)
            return jnp.sum(co.unpack(carry["state"])["ab"] ** 2)
        return f

    theta = jnp.asarray(1.17)
    h = 1e-3
    f0 = make_loss("implicit")
    fd = (f0(theta + h) - f0(theta - h)) / (2 * h)
    print(f"finite difference reference: {float(fd):+.6f}")
    for mode in ("unroll", "implicit", "truncated", "dlm"):
        g_fn = jax.jit(jax.grad(make_loss(mode)))
        g = g_fn(theta)  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            g = g_fn(theta)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / 10
        print(f"{mode:10s} grad {float(g):+.6f}  ({dt*1e3:.2f} ms/grad)")


if __name__ == "__main__":
    main()
