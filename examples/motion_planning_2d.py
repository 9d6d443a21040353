"""GPMP2-style 2D motion planning around obstacles (reference
examples/motion_planning_2d.py): GP priors + SDF collision hinge costs."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

import _config
from theseus_tpu.embodied import occupancy_to_sdf
from theseus_tpu.utils.examples.motion_planning import MotionPlanner


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--map-size", type=int, default=32)
    p.add_argument("--cell-size", type=float, default=0.1)
    p.add_argument("--num-time-steps", type=int, default=24)
    p.add_argument("--total-time", type=float, default=2.0)
    p.add_argument("--epsilon-dist", type=float, default=0.25)
    p.add_argument("--collision-weight", type=float, default=40.0)
    p.add_argument("--max-iterations", type=int, default=60)
    args = _config.parse_with_config(p, argv)

    map_size, cell = args.map_size, args.cell_size
    occ = np.zeros((map_size, map_size))
    h = map_size
    occ[h * 10 // 32 : h * 22 // 32, h * 14 // 32 : h * 18 // 32] = 1.0
    occ[h * 16 // 32 : h * 18 // 32, h * 14 // 32 : h * 18 // 32] = 0.0
    sdf = occupancy_to_sdf(occ, cell)

    planner = MotionPlanner(
        map_size=map_size,
        epsilon_dist=args.epsilon_dist,
        total_time=args.total_time,
        collision_weight=args.collision_weight,
        Qc_inv=np.eye(2),
        num_time_steps=args.num_time_steps,
        max_iterations=args.max_iterations,
        adaptive_damping=True,
    )
    # start/goal derived from the map extent so non-default --map-size /
    # --cell-size keep both inside the SDF (extent = map_size * cell_size)
    extent = map_size * cell
    start = jnp.asarray([[0.09375 * extent, 0.5 * extent]], jnp.float64)
    goal = jnp.asarray([[0.90625 * extent, 0.5 * extent]], jnp.float64)
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
