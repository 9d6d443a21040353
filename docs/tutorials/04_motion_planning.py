# %% [markdown]
# # Tutorial 4: Motion planning
#
# (port of the reference's tutorials/04_motion_planning.ipynb)
#
# GPMP2-style trajectory optimization: a trajectory of Point2 poses +
# velocities connected by Gauss-Markov GP motion priors, pulled away from
# obstacles by hinge costs on a signed distance field (SDF), with boundary
# costs pinning start and goal. The `MotionPlanner` facade bundles the
# objective, optimizer, and layer (reference
# utils/examples/motion_planning/motion_planner.py:57,259).

# %%
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils.examples.motion_planning import MotionPlanner

# %% [markdown]
# ## An SDF with one circular obstacle in the middle

# %%
MAP_SIZE, CELL = 20, 0.2
xs = (jnp.arange(MAP_SIZE) + 0.5) * CELL
gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
center, radius = jnp.asarray([2.1, 1.7]), 0.5
sdf = jnp.linalg.norm(
    jnp.stack([gx, gy], -1) - center, axis=-1
) - radius  # (H, W), positive outside

# %% [markdown]
# ## Plan

# %%
planner = MotionPlanner(
    map_size=MAP_SIZE,
    epsilon_dist=0.35,       # hinge activation distance
    total_time=2.0,
    collision_weight=30.0,
    Qc_inv=[[1.0, 0.0], [0.0, 1.0]],
    num_time_steps=14,
    max_iterations=30,
    dtype=jnp.float64,
)

start = jnp.asarray([[0.3, 0.3]])
goal = jnp.asarray([[3.7, 3.7]])
values, info = planner.solve(
    start, goal,
    sdf_origin=jnp.zeros((1, 2)),
    sdf_data=sdf[None],
    cell_size=jnp.full((1, 1), CELL),
)
traj = np.asarray(planner.trajectory(values))[0]  # (T+1, 2)
print("trajectory:")
for p in traj:
    print(f"  ({p[0]:.2f}, {p[1]:.2f})")

# %% [markdown]
# The straight line from start to goal passes through the obstacle; the
# planned trajectory must detour around it while staying smooth (GP prior)
# and hitting the endpoints (boundary costs).

# %%
clearance = np.linalg.norm(traj - np.asarray(center), axis=-1) - float(radius)
print("min clearance along trajectory:", clearance.min())
assert clearance.min() > 0.0, "trajectory must avoid the obstacle"
np.testing.assert_allclose(traj[0], np.asarray(start[0]), atol=1e-3)
np.testing.assert_allclose(traj[-1], np.asarray(goal[0]), atol=1e-3)
print("tutorial 04 OK")
