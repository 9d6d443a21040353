"""Bundle adjustment (reference examples/bundle_adjustment.py:112): synthetic
scene or a BAL file, Reprojection costs with optional robust loss, sparse
(mixed-dof) block Cholesky solver."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import argparse

import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.utils.examples.bundle_adjustment import (
    ba_values,
    build_ba_objective,
    load_bal,
    synthetic_ba,
)


def main(bal_path=None, cameras=8, points=40, robust=True, linearization="sparse"):
    if bal_path:
        prob = load_bal(bal_path)
    else:
        prob = synthetic_ba(num_cameras=cameras, num_points=points,
                            outlier_fraction=0.05 if robust else 0.0,
                            visibility=0.5)
    obj, cams, pts = build_ba_objective(
        prob,
        robust_loss_cls=tt.HuberLoss if robust else None,
        log_loss_radius=float(np.log(1.0)),
    )
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=15, adaptive_damping=True, linearization=linearization
    )
    layer = tt.TheseusLayer(opt)
    init = ba_values(prob)
    init_err = np.asarray(obj.error_metric(values=obj.default_values(init)))
    values, info = layer.forward(init)
    final_err = np.asarray(obj.error_metric(values=values))
    print(f"cameras={prob.num_cameras} points={prob.num_points} "
          f"observations={len(prob.obs_cam)} solver={linearization}")
    print(f"error: {init_err.mean():.4f} -> {final_err.mean():.6f} "
          f"(status {np.asarray(info.status)})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--bal", default=None, help="path to a BAL-format file")
    p.add_argument("--cameras", type=int, default=8)
    p.add_argument("--points", type=int, default=40)
    p.add_argument("--no-robust", action="store_true")
    p.add_argument("--linearization", default="sparse", choices=["dense", "sparse"])
    import _config
    a = _config.parse_with_config(p)
    main(a.bal, a.cameras, a.points, not a.no_robust, a.linearization)
