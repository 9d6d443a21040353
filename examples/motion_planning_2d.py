"""GPMP2-style 2D motion planning around obstacles (reference
examples/motion_planning_2d.py): GP priors + SDF collision hinge costs."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from theseus_tpu.embodied import occupancy_to_sdf
from theseus_tpu.utils.examples.motion_planning import MotionPlanner


def main():
    map_size, cell = 32, 0.1
    occ = np.zeros((map_size, map_size))
    occ[10:22, 14:18] = 1.0  # a wall with a gap
    occ[16:18, 14:18] = 0.0
    sdf = occupancy_to_sdf(occ, cell)

    planner = MotionPlanner(
        map_size=map_size,
        epsilon_dist=0.25,
        total_time=2.0,
        collision_weight=40.0,
        Qc_inv=np.eye(2),
        num_time_steps=24,
        max_iterations=60,
        adaptive_damping=True,
    )
    start = jnp.asarray([[0.3, 1.6]], jnp.float64)
    goal = jnp.asarray([[2.9, 1.6]], jnp.float64)
    values, info = planner.solve(
        start, goal,
        sdf_origin=jnp.zeros((1, 2), jnp.float64),
        sdf_data=jnp.asarray(sdf)[None],
        cell_size=jnp.asarray([[cell]], jnp.float64),
    )
    traj = np.asarray(planner.trajectory(values))[0]
    print("status:", np.asarray(info.status), "final err:", float(info.last_err[0]))
    print("trajectory (every 4th):")
    for p in traj[::4]:
        print(f"  ({p[0]:.2f}, {p[1]:.2f})")


if __name__ == "__main__":
    main()
