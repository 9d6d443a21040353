"""Bundle adjustment end-to-end: synthetic BA with the sparse (mixed-dof)
path, reprojection error drops to noise level; robust BA rejects outliers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.utils.examples.bundle_adjustment import (
    ba_values,
    build_ba_objective,
    synthetic_ba,
)


@pytest.mark.parametrize("lin", ["dense", "sparse"])
def test_ba_converges(lin):
    prob = synthetic_ba(num_cameras=4, num_points=12, batch=1, seed=0)
    obj, cams, pts = build_ba_objective(prob, gauge_target=prob.gt_poses[0])
    # pin monocular scale: weak prior on one landmark at its true position
    obj.add(tt.Local(pts[0], prob.gt_points[0],
                     tt.ScaleCostWeight(jnp.asarray(100.0, jnp.float64)),
                     name="scale_pin"))
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=20, adaptive_damping=True, linearization=lin
    )
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(ba_values(prob))
    final_err = np.asarray(obj.error_metric(values=values))
    init_err = np.asarray(obj.error_metric(values=obj.default_values(ba_values(prob))))
    assert np.all(final_err < 1e-4 * init_err)
    # recovered points close to ground truth
    d = np.asarray(values["pt"])[3] - np.asarray(prob.gt_points[3])
    assert np.abs(d).max() < 0.05


def test_ba_robust_with_outliers():
    prob = synthetic_ba(
        num_cameras=4, num_points=12, batch=1, seed=1, outlier_fraction=0.1
    )
    obj, cams, pts = build_ba_objective(
        prob, robust_loss_cls=tt.HuberLoss, log_loss_radius=np.log(1.0),
        gauge_target=prob.gt_poses[0],
    )
    obj.add(tt.Local(pts[0], prob.gt_points[0],
                     tt.ScaleCostWeight(jnp.asarray(100.0, jnp.float64)),
                     name="scale_pin"))
    opt = tt.LevenbergMarquardt(obj, max_iterations=30, adaptive_damping=True)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(ba_values(prob))
    d = np.asarray(values["pt"])[5] - np.asarray(prob.gt_points[5])
    assert np.abs(d).max() < 0.1
