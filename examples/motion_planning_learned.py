"""Learned motion planning: train the initial-trajectory model through the
planner (reference utils/examples/motion_planning/models.py:54
InitialTrajectoryModel + the motion-planning experiments that drive it).

An MLP maps (start, goal) to an initial trajectory; the differentiable
MotionPlanner refines it for a FIXED small number of LM iterations, and the
outer loss is the solution's objective error — so the model learns
initializations from which a few expensive planner iterations already reach
a good trajectory (the reference's motivation for learned initialization).
A scalar collision-weight model (reference ScalarCollisionWeightModel,
models.py:102) is trained jointly from an SDF clearance feature.

Run (CPU):
    python examples/motion_planning_learned.py [--steps 10] [--batch 4]
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.utils.examples.motion_planning import (
    MotionPlanner,
    create_collision_weight_model,
    create_initial_trajectory_model,
)

MAP_SIZE = 16
CELL = 0.25
NUM_STEPS = 10
TOTAL_TIME = 2.0


def random_sdf(key, batch):
    """Batch of circle-obstacle SDFs on a MAP_SIZE^2 grid."""
    ks = jax.random.split(key, 3)
    centers = jax.random.uniform(
        ks[0], (batch, 2, 2), minval=0.8, maxval=MAP_SIZE * CELL - 0.8
    )
    radii = jax.random.uniform(ks[1], (batch, 2), minval=0.3, maxval=0.6)
    xs = (jnp.arange(MAP_SIZE) + 0.5) * CELL
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
    grid = jnp.stack([gx, gy], -1)  # (H, W, 2)

    def one(c, r):
        d = jnp.linalg.norm(grid[None] - c[:, None, None], axis=-1) - r[:, None, None]
        return jnp.min(d, axis=0)

    sdf = jax.vmap(one)(centers, radii)  # (B, H, W)
    return sdf


def make_problems(key, batch):
    k1, k2 = jax.random.split(key)
    sdf = random_sdf(k1, batch)
    side = MAP_SIZE * CELL
    start = jnp.tile(jnp.asarray([[0.5, 0.5]]), (batch, 1))
    goal = jnp.tile(jnp.asarray([[side - 0.5, side - 0.5]]), (batch, 1))
    jitter = 0.3 * jax.random.normal(k2, (batch, 4))
    return start + jitter[:, :2], goal + jitter[:, 2:], sdf


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--inner-iters", type=int, default=3)
    import _config
    a = _config.parse_with_config(p)

    import optax

    planner = MotionPlanner(
        map_size=MAP_SIZE,
        epsilon_dist=0.4,
        total_time=TOTAL_TIME,
        collision_weight=20.0,
        Qc_inv=[[1.0, 0.0], [0.0, 1.0]],
        num_time_steps=NUM_STEPS,
        max_iterations=a.inner_iters,
        dtype=jnp.float64,
        learnable_collision_weight=True,
    )
    obj = planner.objective
    co = obj.compile()
    opts = planner.optimizer.opts
    layer = planner.layer

    key = jax.random.PRNGKey(0)
    traj_params, traj_apply = create_initial_trajectory_model(
        NUM_STEPS, jax.random.PRNGKey(1)
    )
    cw_params, cw_apply = create_collision_weight_model(jax.random.PRNGKey(2))
    params = {"traj": traj_params, "cw": cw_params}

    origin = jnp.zeros((1, 2))
    cell = jnp.full((1, 1), CELL)

    def loss_fn(params, start, goal, sdf):
        b = start.shape[0]
        init = traj_apply(params["traj"], start, goal, TOTAL_TIME)
        # clearance feature -> learned collision weight (B, 1)
        feat = jnp.mean(jnp.minimum(sdf, 1.0), axis=(1, 2))[:, None]
        cw = cw_apply(params["cw"], feat)
        values = dict(init)
        values.update(
            start=start, goal=goal,
            sdf_origin=jnp.tile(origin, (b, 1)),
            sdf_data=sdf, cell_size=jnp.tile(cell, (b, 1)),
            collision_w=cw,
        )
        values = obj.default_values(values)
        state = co.pack(values, b)
        aux = co.build_aux(values, b)
        carry = layer.solve_state(state, aux, "truncated", opts, 1)
        # outer loss: quality of the refined trajectory (objective error)
        return jnp.mean(carry["err"])

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        start, goal, sdf = make_problems(key, a.batch)
        loss, g = jax.value_and_grad(loss_fn)(params, start, goal, sdf)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    t0 = time.time()
    for i in range(a.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
        if i % 2 == 0 or i == a.steps - 1:
            print(f"step {i:3d}  planner err {losses[-1]:.5f}", flush=True)
    print(f"({(time.time() - t0) / a.steps * 1e3:.0f} ms/step)")
    first, best = losses[0], min(losses)
    print(f"planner error: first {first:.5f} -> best {best:.5f}")
    assert best < first, "outer training must reduce the planner error"


if __name__ == "__main__":
    main()
