"""2D state estimation with learned cost weights and backward modes.

Re-design of the reference examples/state_estimation_2d.py: a chain of 2D
positions with noisy GPS-like measurements and odometry; the measurement
weight is a learnable scalar trained in an outer loop by differentiating
through the inner solve (choose unroll / implicit / truncated / dlm)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt


def simulate(batch=8, steps=20, gps_noise=0.4, odo_noise=0.05, seed=0):
    rng = np.random.RandomState(seed)
    vel = rng.uniform(-0.3, 0.3, (batch, 1, 2))
    gt = np.cumsum(np.repeat(vel, steps, axis=1), axis=1)
    gps = gt + gps_noise * rng.randn(*gt.shape)
    odo = np.diff(gt, axis=1) + odo_noise * rng.randn(batch, steps - 1, 2)
    return jnp.asarray(gt), jnp.asarray(gps), jnp.asarray(odo)


def build(steps, gps, odo, weight_var):
    obj = tt.Objective(dtype=jnp.float64)
    xs = [tt.Point2(name=f"x_{i}") for i in range(steps)]
    for i in range(steps):
        obj.add(
            tt.Local(xs[i], gps[:, i], weight_var, name=f"gps_{i}")
        )
    ow = tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64))
    for i in range(steps - 1):
        obj.add(
            tt.Between(xs[i], xs[i + 1], odo[:, i], cost_weight=ow, name=f"odo_{i}")
        )
    return obj, xs


def main(mode="implicit", epochs=20):
    steps, batch = 20, 8
    gt, gps, odo = simulate(batch, steps)
    w = tt.ScaleCostWeight(jnp.asarray(1.0, jnp.float64), name="gps_weight")
    obj, xs = build(steps, gps, odo, w)
    opt = tt.GaussNewton(obj, max_iterations=10)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    init = {f"x_{i}": jnp.zeros((batch, 2), jnp.float64) for i in range(steps)}
    values = obj.default_values(init)
    state = co.pack(values, batch)

    gt_flat = gt.reshape(batch, -1)

    @jax.jit
    def loss_fn(log_w):
        vals = dict(values)
        vals[w.scale.name] = jnp.exp(log_w) * jnp.ones((1, 1))
        aux = co.build_aux(vals, batch)
        carry = layer.solve_state(state, aux, mode, opt.opts, 5)
        sol = co.unpack(carry["state"])
        est = jnp.concatenate([sol[f"x_{i}"] for i in range(steps)], axis=-1)
        return jnp.mean((est - gt_flat) ** 2)

    log_w = jnp.asarray(0.0, jnp.float64)
    for ep in range(epochs):
        loss, g = jax.value_and_grad(loss_fn)(log_w)
        log_w = log_w - 2.0 * g
        if ep % 5 == 0 or ep == epochs - 1:
            print(f"epoch {ep:3d} loss {float(loss):.5f} gps weight {float(jnp.exp(log_w)):.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="implicit", choices=["unroll", "implicit", "truncated", "dlm"])
    p.add_argument("--epochs", type=int, default=20)
    import _config
    a = _config.parse_with_config(p)
    main(a.mode, a.epochs)
