"""SE2 trajectory optimization with nonholonomic constraints (reference
examples/se2_planning.py): plan SE2 poses + velocities from start to goal,
penalizing sideways velocity."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

import _config
import theseus_tpu as tt
from theseus_tpu.embodied import DoubleIntegrator, Nonholonomic


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-steps", type=int, default=16)
    p.add_argument("--dt", type=float, default=0.25)
    p.add_argument("--max-iterations", type=int, default=80)
    p.add_argument("--nonholonomic-weight", type=float, default=50.0)
    args = _config.parse_with_config(p, argv)

    n = args.num_steps
    dt = args.dt
    dtype = jnp.float64
    obj = tt.Objective(dtype=dtype)

    poses = [tt.SE2(name=f"pose_{i}") for i in range(n)]
    vels = [tt.Vector(3, name=f"vel_{i}") for i in range(n)]

    start = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], dtype)  # (x, y, cos, sin)
    goal = jnp.asarray([[2.0, 1.0, 0.0, 1.0]], dtype)
    bw = tt.ScaleCostWeight(jnp.asarray(100.0, dtype))
    obj.add(tt.Local(poses[0], start, bw, name="start"))
    obj.add(tt.Local(poses[-1], goal, bw, name="goal"))
    obj.add(tt.Local(vels[0], jnp.zeros((1, 3), dtype), bw, name="v0"))
    obj.add(tt.Local(vels[-1], jnp.zeros((1, 3), dtype), bw, name="vT"))

    dw = tt.ScaleCostWeight(jnp.asarray(5.0, dtype))
    nw = tt.ScaleCostWeight(jnp.asarray(args.nonholonomic_weight, dtype))
    for i in range(n - 1):
        obj.add(DoubleIntegrator(poses[i], vels[i], poses[i + 1], vels[i + 1], dt, dw,
                                 name=f"di_{i}"))
    for i in range(n):
        obj.add(Nonholonomic(poses[i], vels[i], nw, name=f"nh_{i}"))

    init = {f"pose_{i}": start for i in range(n)}
    init.update({f"vel_{i}": jnp.zeros((1, 3), dtype) for i in range(n)})
    opt = tt.LevenbergMarquardt(obj, max_iterations=args.max_iterations,
                                adaptive_damping=True)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(init)
    print("status:", np.asarray(info.status), "final err:", float(info.last_err[0]))
    print("trajectory (x, y, heading):")
    for i in range(0, n, 3):
        p = np.asarray(values[f"pose_{i}"])[0]
        print(f"  ({p[0]:+.2f}, {p[1]:+.2f}, {np.arctan2(p[3], p[2]):+.2f})")
    side_vel = max(
        abs(float(np.asarray(values[f"vel_{i}"])[0, 1])) for i in range(n)
    )
    print("max sideways velocity:", side_vel)


if __name__ == "__main__":
    main()
