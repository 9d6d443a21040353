"""Tactile pose estimation: objective builder, measurement/weight models,
and an outer-loop trainer (the reference's backward-mode benchmark workload,
Fig. 4).

Re-design of theseus/utils/examples/tactile_pose_estimation/
pose_estimator.py:16 (objective structure), models.py:19,51 (tactile
measurement + learnable weight models) and trainer.py:50 (outer loop):

- SE2 object + end-effector poses over a time window
- QuasiStaticPushingPlanar dynamics between consecutive steps
- MovingFrameBetween costs against (learned) tactile relative measurements
- EffectorObjectContactPlanar contact against the object SDF
- Difference priors on effector poses from motion capture
- Diagonal/scalar cost weights parameterized by a learnable model trained by
  differentiating through the inner solve.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import core
from ...embodied import (
    Difference,
    EffectorObjectContactPlanar,
    MovingFrameBetween,
    QuasiStaticPushingPlanar,
)
from ...layer import TheseusLayer
from ...optim.nonlinear import LevenbergMarquardt
from ..checks import build_mlp


def measurement_windows(time_steps: int, min_w: int, max_w: int, step_w: int):
    """(i - offset, i) pairs for moving-frame measurements (reference
    pose_estimator.py:60-66)."""
    pairs = []
    for i in range(min_w, time_steps):
        for offset in range(min_w, min(i, max_w), step_w):
            pairs.append((i - offset, i))
    return pairs


class TactilePoseEstimator:
    def __init__(
        self,
        time_steps: int,
        min_window_moving_frame: int = 1,
        max_window_moving_frame: int = 3,
        step_window_moving_frame: int = 1,
        rectangle_shape: Tuple[float, float] = (0.1, 0.1),
        sdf_size: int = 32,
        optimizer_cls=LevenbergMarquardt,
        max_iterations: int = 3,
        dtype=jnp.float64,
    ):
        self.time_steps = time_steps
        self.pairs = measurement_windows(
            time_steps, min_window_moving_frame, max_window_moving_frame,
            step_window_moving_frame,
        )
        obj = core.Objective(dtype=dtype)

        obj_poses = [core.SE2(name=f"obj_pose_{i}") for i in range(time_steps)]
        eff_poses = [core.SE2(name=f"eff_pose_{i}") for i in range(time_steps)]
        self.obj_poses, self.eff_poses = obj_poses, eff_poses

        start = core.Variable(jnp.zeros((1, 4), dtype).at[:, 2].set(1.0), name="obj_start_pose")
        mocap = [
            core.Variable(jnp.zeros((1, 4), dtype).at[:, 2].set(1.0), name=f"motion_capture_{i}")
            for i in range(time_steps)
        ]
        nn_meas = {
            (a, b): core.Variable(
                jnp.zeros((1, 4), dtype).at[:, 2].set(1.0), name=f"nn_measurement_{a}_{b}"
            )
            for (a, b) in self.pairs
        }
        self.sdf_data = core.Variable(jnp.ones((1, sdf_size, sdf_size), dtype), name="sdf_data")
        self.sdf_origin = core.Variable(jnp.zeros((1, 2), dtype), name="sdf_origin")
        self.sdf_cell_size = core.Variable(jnp.full((1, 1), 0.01, dtype), name="sdf_cell_size")
        eff_radius = core.Variable(jnp.zeros((1, 1), dtype), name="eff_radius")

        qsp_w = core.DiagonalCostWeight(core.Variable(jnp.ones((1, 3), dtype), name="qsp_weight"))
        mf_w = core.DiagonalCostWeight(core.Variable(jnp.ones((1, 3), dtype), name="mf_between_weight"))
        contact_w = core.ScaleCostWeight(core.Variable(jnp.ones((1, 1), dtype), name="intersect_weight"))
        mocap_w = core.DiagonalCostWeight(core.Variable(jnp.ones((1, 3), dtype), name="mc_weight"))

        c_square = float(np.hypot(*rectangle_shape) ** 2)
        obj.add(
            Difference(
                obj_poses[0], start,
                core.ScaleCostWeight(jnp.asarray(100.0, dtype)), name="obj_prior",
            )
        )
        for i in range(1, time_steps):
            obj.add(
                QuasiStaticPushingPlanar(
                    obj_poses[i - 1], obj_poses[i], eff_poses[i - 1], eff_poses[i],
                    c_square, qsp_w, name=f"qsp_{i}",
                )
            )
            obj.add(
                EffectorObjectContactPlanar(
                    obj_poses[i], eff_poses[i], self.sdf_origin, self.sdf_data,
                    self.sdf_cell_size, eff_radius, contact_w, name=f"contact_{i}",
                )
            )
        for (a, b) in self.pairs:
            obj.add(
                MovingFrameBetween(
                    obj_poses[a], obj_poses[b], eff_poses[a], eff_poses[b],
                    nn_meas[(a, b)], mf_w, name=f"mfb_{a}_{b}",
                )
            )
        for i in range(time_steps):
            obj.add(Difference(eff_poses[i], mocap[i], mocap_w, name=f"mocap_{i}"))

        self.objective = obj
        self.optimizer = optimizer_cls(obj, max_iterations=max_iterations)
        self.layer = TheseusLayer(self.optimizer)

    def forward(self, inputs: Dict, **kwargs):
        return self.layer.forward(inputs, optimizer_kwargs=kwargs)


# ---------------------------------------------------------------------------
# Learnable models (reference models.py:19 TactileMeasModel, :51 weight nets)
# ---------------------------------------------------------------------------
def create_tactile_models(feature_dim: int, key, hidden: int = 64):
    """Measurement model: image-feature pairs -> SE2 relative measurement
    (x, y, cos, sin normalized); weight model: scalar k -> 3-dim diag weight.
    Returns (params pytree, apply fns)."""
    k1, k2 = jax.random.split(key)
    meas_params, meas_mlp = build_mlp([2 * feature_dim, hidden, hidden, 4], k1)
    w_params, w_mlp = build_mlp([1, hidden, 3], k2)

    def measurement_apply(params, feat_a, feat_b):
        x = jnp.concatenate([feat_a, feat_b], axis=-1)
        out = meas_mlp(params, x)
        xy, cs = out[..., :2], out[..., 2:]
        cs = cs / jnp.linalg.norm(cs, axis=-1, keepdims=True)
        return jnp.concatenate([xy, cs], axis=-1)

    def weight_apply(params, k):
        return jax.nn.softplus(w_mlp(params, k))

    return {"meas": meas_params, "weight": w_params}, measurement_apply, weight_apply


class TactileTrainer:
    """Outer-loop trainer (reference trainer.py:50): learns the measurement
    and weight models by differentiating the pose-estimation solve."""

    def __init__(self, estimator: TactilePoseEstimator, feature_dim: int,
                 key=None, lr: float = 1e-3, backward_mode: str = "implicit"):
        key = key if key is not None else jax.random.PRNGKey(0)
        self.estimator = estimator
        self.params, self.meas_apply, self.weight_apply = create_tactile_models(
            feature_dim, key
        )
        self.lr = lr
        self.backward_mode = backward_mode

    def build_inputs(self, base_inputs: Dict, params, features: Dict):
        """Fill nn_measurement_* and mf weight from the models."""
        inputs = dict(base_inputs)
        for (a, b) in self.estimator.pairs:
            inputs[f"nn_measurement_{a}_{b}"] = self.meas_apply(
                params["meas"], features[a], features[b]
            )
        inputs["mf_between_weight"] = self.weight_apply(
            params["weight"], jnp.ones((1, 1))
        )
        return inputs

    def loss(self, params, base_inputs: Dict, features: Dict, obj_gt):
        co = self.estimator.objective.compile()
        inputs = self.build_inputs(base_inputs, params, features)
        values = self.estimator.objective.default_values(inputs)
        bsz = co.resolve_batch_size(values)
        state = co.pack(values, bsz)
        aux = co.build_aux(values, bsz)
        carry = self.estimator.layer.solve_state(
            state, aux, self.backward_mode, self.estimator.optimizer.opts
        )
        sol = co.unpack(carry["state"])
        t = self.estimator.time_steps
        est = jnp.stack([sol[f"obj_pose_{i}"] for i in range(t)], axis=1)
        return jnp.mean((est[..., :2] - obj_gt[None, :, :2]) ** 2)

    def step(self, base_inputs: Dict, features: Dict, obj_gt):
        val, grads = jax.value_and_grad(self.loss)(
            self.params, base_inputs, features, obj_gt
        )
        self.params = jax.tree_util.tree_map(
            lambda p, g: p - self.lr * g, self.params, grads
        )
        return float(val)
