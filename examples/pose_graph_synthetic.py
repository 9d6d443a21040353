"""Synthetic SE3 pose-graph optimization with a learned robust-loss radius.

Re-design of the reference examples/pose_graph/pose_graph_synthetic.py:87 —
the outer loop learns the Welsch log-radius of robust Between costs so the
inner LM solve best rejects loop-closure outliers."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.utils.examples.pose_graph import (
    build_pgo_objective,
    pose_values,
    synthetic_pose_graph,
)


def main(n_poses=64, batch=8, epochs=10, linearization="dense"):
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, dtype=jnp.float64, meas_noise=0.02
    )
    # corrupt a few loop-closure edges to create outliers
    key = jax.random.PRNGKey(7)
    from theseus_tpu.lie import se3

    bad = se3.exp(1.5 * jax.random.normal(key, (2, batch, 6), dtype=jnp.float64))
    meas = meas.at[-2:].set(se3.compose(meas[-2:], bad))

    obj, poses = build_pgo_objective(
        n_poses, edges, meas, gt[0], dtype=jnp.float64,
        robust_loss_cls=tt.WelschLoss, log_loss_radius=0.0,
    )
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=15, adaptive_damping=True, linearization=linearization
    )
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)

    gt_flat = jnp.concatenate([gt[i].reshape(batch, -1) for i in range(n_poses)], -1)

    @jax.jit
    def loss_fn(log_radius):
        vals2 = dict(values)
        vals2["log_loss_radius"] = log_radius * jnp.ones((1, 1))
        aux = co.build_aux(vals2, batch)
        carry = layer.solve_state(state, aux, "implicit", opt.opts)
        sol = carry["state"]
        est = jnp.concatenate(
            [sol["SE3"][i].reshape(batch, -1) for i in range(n_poses)], -1
        )
        return jnp.mean((est - gt_flat) ** 2)

    log_radius = jnp.asarray(2.0, jnp.float64)
    for ep in range(epochs):
        t0 = time.perf_counter()
        loss, g = jax.value_and_grad(loss_fn)(log_radius)
        log_radius = log_radius - 5.0 * g
        print(
            f"epoch {ep:2d} loss {float(loss):.6f} "
            f"log_radius {float(log_radius):.4f} ({time.perf_counter()-t0:.2f}s)"
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--linearization", default="dense", choices=["dense", "sparse"])
    import _config
    a = _config.parse_with_config(p)
    main(a.n_poses, a.batch, a.epochs, a.linearization)
