"""Motion planning helpers: GP-prior trajectory objective + planner facade.

Re-design of the reference MotionPlannerObjective / MotionPlanner
(theseus/utils/examples/motion_planning/motion_planner.py:57,259): a GPMP2-
style trajectory optimization over Point2 poses + Vector2 velocities with
boundary costs, GP motion priors, and collision hinge costs against a 2D
SDF."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ... import core
from ...embodied import Collision2D, GPCostWeight, GPMotionModel, Local
from ...optim.nonlinear import GaussNewton, LevenbergMarquardt
from ...layer import TheseusLayer


class MotionPlannerObjective(core.Objective):
    """Boundary costs + GP priors + per-timestep collision hinge
    (reference motion_planner.py:57-234)."""

    def __init__(
        self,
        map_size: int,
        epsilon_dist: float,
        total_time: float,
        collision_weight: float,
        Qc_inv,
        num_time_steps: int,
        boundary_weight: float = 100.0,
        dtype=jnp.float64,
        learnable_collision_weight: bool = False,
    ):
        super().__init__(dtype=dtype)
        self.num_time_steps = num_time_steps
        self.total_time = total_time
        dt = total_time / num_time_steps

        self.poses = [core.Point2(name=f"pose_{i}") for i in range(num_time_steps + 1)]
        self.velocities = [
            core.Vector(2, name=f"vel_{i}") for i in range(num_time_steps + 1)
        ]
        # named inputs (updated per forward): start/goal, sdf data
        self.start = core.Variable(jnp.zeros((1, 2), dtype), name="start")
        self.goal = core.Variable(jnp.zeros((1, 2), dtype), name="goal")
        self.sdf_origin = core.Variable(jnp.zeros((1, 2), dtype), name="sdf_origin")
        self.sdf_data = core.Variable(
            jnp.ones((1, map_size, map_size), dtype), name="sdf_data"
        )
        self.cell_size = core.Variable(jnp.ones((1, 1), dtype), name="cell_size")

        bw = core.ScaleCostWeight(jnp.asarray(boundary_weight, dtype))
        self.add(Local(self.poses[0], self.start, bw, name="start_cost"))
        self.add(Local(self.poses[-1], self.goal, bw, name="goal_cost"))
        zero_vel = jnp.zeros((1, 2), dtype)
        self.add(Local(self.velocities[0], zero_vel, bw, name="start_vel"))
        self.add(Local(self.velocities[-1], zero_vel, bw, name="goal_vel"))

        qc = jnp.asarray(Qc_inv, dtype)
        if learnable_collision_weight:
            # named input "collision_w" (B, 1): the outer loop can feed a
            # learned per-problem weight (reference models.py:102
            # ScalarCollisionWeightModel -> objective update path)
            cw = core.ScaleCostWeight(
                core.Variable(
                    jnp.full((1, 1), collision_weight, dtype),
                    name="collision_w",
                )
            )
        else:
            cw = core.ScaleCostWeight(jnp.asarray(collision_weight, dtype))
        for i in range(num_time_steps):
            gpw = GPCostWeight(qc, dt, name=f"gpw_{i}")
            self.add(
                GPMotionModel(
                    self.poses[i],
                    self.velocities[i],
                    self.poses[i + 1],
                    self.velocities[i + 1],
                    dt,
                    gpw,
                    name=f"gp_{i}",
                )
            )
        for i in range(1, num_time_steps + 1):
            self.add(
                Collision2D(
                    self.poses[i],
                    sdf_origin=self.sdf_origin,
                    sdf_data=self.sdf_data,
                    sdf_cell_size=self.cell_size,
                    cost_eps=epsilon_dist,
                    cost_weight=cw,
                    name=f"collision_{i}",
                )
            )


class MotionPlanner:
    """Facade bundling objective + optimizer + layer (reference :259)."""

    def __init__(
        self,
        map_size: int,
        epsilon_dist: float,
        total_time: float,
        collision_weight: float,
        Qc_inv,
        num_time_steps: int,
        optimizer_cls=LevenbergMarquardt,
        max_iterations: int = 50,
        dtype=jnp.float64,
        **opt_kwargs,
    ):
        self.objective = MotionPlannerObjective(
            map_size,
            epsilon_dist,
            total_time,
            collision_weight,
            Qc_inv,
            num_time_steps,
            dtype=dtype,
            learnable_collision_weight=opt_kwargs.pop(
                "learnable_collision_weight", False
            ),
        )
        self.optimizer = optimizer_cls(
            self.objective, max_iterations=max_iterations, **opt_kwargs
        )
        self.layer = TheseusLayer(self.optimizer)

    def straight_line_initialization(self, start, goal) -> Dict:
        """Linear interpolation + constant velocity (reference
        motion_planner.py get_variable_values_from_straight_line)."""
        n = self.objective.num_time_steps
        ts = jnp.linspace(0.0, 1.0, n + 1)[None, :, None]
        traj = start[:, None] + ts * (goal - start)[:, None]
        vel = jnp.broadcast_to(
            ((goal - start) / self.objective.total_time)[:, None], traj.shape
        )
        init = {f"pose_{i}": traj[:, i] for i in range(n + 1)}
        init.update({f"vel_{i}": vel[:, i] for i in range(n + 1)})
        return init

    def solve(self, start, goal, sdf_origin, sdf_data, cell_size,
              initialization: Optional[Dict] = None, **kwargs):
        inputs = initialization or self.straight_line_initialization(start, goal)
        inputs = dict(inputs)
        inputs.update(
            start=start, goal=goal, sdf_origin=sdf_origin,
            sdf_data=sdf_data, cell_size=cell_size,
        )
        return self.layer.forward(inputs, optimizer_kwargs=kwargs)

    def trajectory(self, values) -> jnp.ndarray:
        n = self.objective.num_time_steps
        return jnp.stack([values[f"pose_{i}"] for i in range(n + 1)], axis=1)


# ---------------------------------------------------------------------------
# Learnable models (reference utils/examples/motion_planning/models.py):
# initial-trajectory prediction and scalar collision-weight models for the
# outer learning loop.
# ---------------------------------------------------------------------------
def create_initial_trajectory_model(num_time_steps: int, key, hidden: int = 64):
    """MLP mapping (start, goal) -> full trajectory initialization
    (poses + velocities), trained by differentiating through the planner.
    Returns (params, apply(params, start (B,2), goal (B,2)) -> values dict)."""
    from ..checks import build_mlp

    out_dim = 4 * (num_time_steps + 1)  # (x, y, vx, vy) per step
    params, mlp = build_mlp([4, hidden, hidden, out_dim], key)

    def apply(params, start, goal, total_time: float):
        x = jnp.concatenate([start, goal], axis=-1)
        raw = mlp(params, x).reshape(start.shape[0], num_time_steps + 1, 4)
        # residual on top of the straight-line initialization
        ts = jnp.linspace(0.0, 1.0, num_time_steps + 1)[None, :, None]
        line = start[:, None] + ts * (goal - start)[:, None]
        vel0 = jnp.broadcast_to(((goal - start) / total_time)[:, None], line.shape)
        poses = line + 0.1 * raw[..., :2]
        vels = vel0 + 0.1 * raw[..., 2:]
        init = {f"pose_{i}": poses[:, i] for i in range(num_time_steps + 1)}
        init.update({f"vel_{i}": vels[:, i] for i in range(num_time_steps + 1)})
        return init

    return params, apply


def create_collision_weight_model(key, hidden: int = 32):
    """Scalar collision-weight model: map a per-problem feature (e.g. sdf
    clearance statistic) to a positive weight (reference models.py
    ScalarCollisionWeightModel)."""
    from ..checks import build_mlp

    params, mlp = build_mlp([1, hidden, 1], key)

    def apply(params, feature):
        import jax

        return jax.nn.softplus(mlp(params, feature)) + 1e-4

    return params, apply
