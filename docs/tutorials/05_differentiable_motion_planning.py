# %% [markdown]
# # Tutorial 5: Differentiable motion planning
#
# (port of the reference's tutorials/05_differentiable_motion_planning.ipynb)
#
# The planner from tutorial 4 is differentiable, so its *parameters* can be
# learned. Here we learn the scalar collision weight so that planned
# trajectories keep a desired clearance from obstacles — a miniature of the
# reference's learned motion-planning experiments (see
# examples/motion_planning_learned.py for the full version with the
# initial-trajectory and collision-weight MODELS trained jointly).

# %%
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils.examples.motion_planning import MotionPlanner

MAP_SIZE, CELL = 16, 0.25
planner = MotionPlanner(
    map_size=MAP_SIZE,
    epsilon_dist=0.4,
    total_time=2.0,
    collision_weight=5.0,
    Qc_inv=[[1.0, 0.0], [0.0, 1.0]],
    num_time_steps=10,
    max_iterations=6,
    dtype=jnp.float64,
    learnable_collision_weight=True,  # exposes input "collision_w"
)
obj = planner.objective
co = obj.compile()
opts = planner.optimizer.opts
layer = planner.layer

# one circular obstacle on the diagonal
xs = (jnp.arange(MAP_SIZE) + 0.5) * CELL
gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
center, radius = jnp.asarray([2.1, 1.7]), 0.45
sdf = (jnp.linalg.norm(jnp.stack([gx, gy], -1) - center, axis=-1) - radius)[None]

start, goal = jnp.asarray([[0.4, 0.4]]), jnp.asarray([[3.6, 3.6]])
TARGET_CLEARANCE = 0.3

# %% [markdown]
# ## The outer loss
#
# Solve the planning problem as a function of log-collision-weight; penalize
# the shortfall of the trajectory's minimum obstacle clearance below the
# target. Gradients flow through the truncated inner solve.

# %%
init = planner.straight_line_initialization(start, goal)


def outer_loss(log_w):
    values = dict(init)
    values.update(
        start=start, goal=goal, sdf_origin=jnp.zeros((1, 2)),
        sdf_data=sdf, cell_size=jnp.full((1, 1), CELL),
        collision_w=jnp.exp(log_w) * jnp.ones((1, 1)),
    )
    values = obj.default_values(values)
    state = co.pack(values, 1)
    aux = co.build_aux(values, 1)
    carry = layer.solve_state(state, aux, "truncated", opts, 1)
    sol = co.unpack(carry["state"])
    traj = jnp.stack(
        [sol[f"pose_{i}"][0] for i in range(planner.objective.num_time_steps + 1)]
    )
    clearance = jnp.linalg.norm(traj - center, axis=-1) - radius
    soft_min = -jax.nn.logsumexp(-20.0 * clearance) / 20.0
    return jax.nn.relu(TARGET_CLEARANCE - soft_min) ** 2


loss_grad = jax.jit(jax.value_and_grad(outer_loss))

log_w = jnp.asarray(jnp.log(5.0))
for i in range(12):
    loss, g = loss_grad(log_w)
    log_w = log_w - 2.0 * g
    if i % 3 == 0 or i == 11:
        print(f"step {i:2d}  loss {float(loss):.5f}  w = {float(jnp.exp(log_w)):.2f}")

final_loss = float(loss_grad(log_w)[0])
print("final clearance-shortfall loss:", final_loss)
assert final_loss < 1e-3, "learned weight must achieve the target clearance"
print("tutorial 05 OK")
