"""Tactile pose estimation from pushing data (reference
examples/tactile_pose_estimation.py + utils/examples/tactile_pose_estimation):
estimate a planar object's trajectory from effector motion-capture + learned
tactile measurements, with quasi-static pushing dynamics and contact
constraints; then run a few outer-loop steps learning the measurement model
by differentiating through the solve."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.embodied import occupancy_to_sdf
from theseus_tpu.lie import se2
from theseus_tpu.utils.examples.tactile_pose_estimation import (
    TactilePoseEstimator,
    TactileTrainer,
)


def synthetic_push(est, dtype=jnp.float64):
    """A straight +x push: effector trails the object by 3 cm."""
    t = est.time_steps
    xs = jnp.linspace(0.1, 0.2, t, dtype=dtype)
    obj_gt = jnp.stack(
        [xs, jnp.full_like(xs, 0.16), jnp.ones_like(xs), jnp.zeros_like(xs)],
        axis=-1,
    )
    eff_gt = obj_gt.at[:, 0].add(-0.03)

    occ = np.zeros((32, 32))
    occ[12:20, 12:20] = 1.0
    sdf = occupancy_to_sdf(occ, 0.01)

    inputs = {"obj_start_pose": obj_gt[:1], "sdf_data": jnp.asarray(sdf)[None]}
    for i in range(t):
        inputs[f"motion_capture_{i}"] = eff_gt[i][None]
        inputs[f"obj_pose_{i}"] = obj_gt[0][None]
        inputs[f"eff_pose_{i}"] = eff_gt[i][None]
    for (a, b) in est.pairs:
        rel = se2.compose(
            se2.inverse(se2.compose(se2.inverse(obj_gt[a]), eff_gt[a])),
            se2.compose(se2.inverse(obj_gt[b]), eff_gt[b]),
        )
        inputs[f"nn_measurement_{a}_{b}"] = rel[None]
    return inputs, obj_gt, eff_gt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--time-steps", type=int, default=5)
    p.add_argument("--inner-iters", type=int, default=5)
    p.add_argument("--outer-steps", type=int, default=3)
    import _config
    a = _config.parse_with_config(p)

    est = TactilePoseEstimator(
        time_steps=a.time_steps, max_iterations=a.inner_iters
    )
    inputs, obj_gt, eff_gt = synthetic_push(est)

    # 1) pure estimation with ground-truth tactile measurements
    values, info = est.forward(inputs)
    err = [
        float(
            jnp.linalg.norm(values[f"obj_pose_{i}"][0, :2] - obj_gt[i, :2])
        )
        for i in range(a.time_steps)
    ]
    print("estimation: per-step position error "
          + " ".join(f"{e:.4f}" for e in err))
    assert np.all(np.asarray(info.status) != tt.NonlinearOptimizerStatus.FAIL)

    # 2) outer loop: learn the measurement network from tracking loss
    feat_dim = 8
    key = jax.random.PRNGKey(0)
    trainer = TactileTrainer(est, feature_dim=feat_dim, key=key, lr=1e-3)
    features = {
        i: jax.random.normal(jax.random.fold_in(key, i), (1, feat_dim))
        for i in range(a.time_steps)
    }
    for step in range(a.outer_steps):
        loss = trainer.step(inputs, features, obj_gt)
        print(f"outer step {step}: tracking loss {loss:.6f}")


if __name__ == "__main__":
    main()
