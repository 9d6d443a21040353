"""Pose-graph optimization on a cube trajectory with OUTLIER loop closures:
plain Gauss-Newton vs robust (Welsch) vs GNC-annealed robust.

Analog of the reference's Ceres-comparison example
(/root/reference/examples/pose_graph/pose_graph_cube.py, which loads the
Ceres `cube' dataset): that dataset isn't redistributable here, so an
equivalent cube-shaped trajectory is generated — poses walking the 12 edges
of a cube — with odometry edges, correct loop closures, and a fraction of
gross-outlier closures. The robust/GNC solves should be unaffected by the
outliers; the plain GN solve should visibly degrade.

Run:  python examples/pose_graph_cube.py [--outlier-frac 0.15]
"""

import argparse
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu import lie
from theseus_tpu.embodied import Between, Local


def cube_trajectory(n_per_edge=4, dtype=jnp.float32):
    """Ground-truth poses walking the edges of a unit cube: positions on a
    closed tour of 8 corners; orientation faces the direction of motion."""
    corners = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 1, 1], [1, 1, 1], [1, 0, 1], [0, 0, 1]], dtype=np.float64)
    tour = list(range(8)) + [0]
    pts = []
    for a, b in zip(tour[:-1], tour[1:]):
        for s in np.linspace(0, 1, n_per_edge, endpoint=False):
            pts.append(corners[a] * (1 - s) + corners[b] * s)
    pts = np.asarray(pts)
    n = len(pts)
    poses = []
    for i in range(n):
        d = pts[(i + 1) % n] - pts[i]
        d = d / (np.linalg.norm(d) + 1e-12)
        up = np.array([0.0, 0.0, 1.0])
        if abs(d @ up) > 0.9:
            up = np.array([0.0, 1.0, 0.0])
        x = d
        z = np.cross(x, up); z /= np.linalg.norm(z)
        y = np.cross(z, x)
        r = np.stack([x, y, z], axis=1)
        poses.append(np.concatenate([r, pts[i][:, None]], axis=1))
    return jnp.asarray(np.stack(poses), dtype)[:, None]  # (N, 1, 3, 4)


def build_problem(gt, outlier_frac, seed, robust, dtype=jnp.float32):
    n = gt.shape[0]
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    edges = [(i, (i + 1) % n) for i in range(n)]  # odometry ring
    closures = [(i, (i + n // 2) % n) for i in range(0, n, 3)]
    edges = edges + closures

    e = jnp.asarray(edges)
    rel = lie.se3.compose(lie.se3.inverse(gt[e[:, 0]]), gt[e[:, 1]])
    noise = lie.se3.exp(0.02 * jax.random.normal(k1, (len(edges), 1, 6), dtype=dtype))
    meas = lie.se3.compose(rel, noise)

    # corrupt a deterministic fraction of the loop closures with gross outliers
    n_odo = n
    n_out = max(1, int(round(outlier_frac * len(closures)))) if outlier_frac > 0 else 0
    out_idx = [n_odo + int(i)
               for i in rng.choice(len(closures), size=n_out, replace=False)]
    if out_idx:
        bad = lie.se3.exp(jnp.asarray(
            rng.uniform(-2, 2, (len(out_idx), 1, 6)), dtype))
        meas = meas.at[jnp.asarray(out_idx)].set(bad)

    obj = tt.Objective(dtype=dtype)
    poses = [tt.SE3(name=f"pose_{i}") for i in range(n)]
    obj.add(Local(poses[0], gt[0], tt.ScaleCostWeight(jnp.asarray(100.0, dtype)),
                  name="prior"))
    radius = tt.Variable(jnp.log(jnp.full((1, 1), 0.5, dtype)), name="log_radius")
    mu_var = tt.Variable(jnp.asarray([[1.0]], dtype), name="mu")
    for ei, (i, j) in enumerate(edges):
        base = Between(poses[i], poses[j], meas[ei], name=f"edge_{ei}")
        if robust == "welsch":
            # flatten_dims=False: the loss gates the WHOLE edge residual norm,
            # the right granularity for outlier loop closures
            obj.add(tt.RobustCostFunction(base, tt.WelschLoss, radius,
                                          flatten_dims=False, name=f"r_{ei}"))
        elif robust == "gnc":
            obj.add(tt.GNCRobustCostFunction(base, tt.GemanMcClureLoss, radius,
                                             mu_var, flatten_dims=False,
                                             name=f"r_{ei}"))
        else:
            obj.add(base)
    return obj, len(out_idx)


def ate(values, gt):
    """Mean translational error vs ground truth."""
    errs = [float(jnp.linalg.norm(values[f"pose_{i}"][0, :, 3] - gt[i, 0, :, 3]))
            for i in range(gt.shape[0])]
    return float(np.mean(errs))


def solve(obj, gt, init_vals, gnc=False):
    opt = tt.LevenbergMarquardt(obj, max_iterations=60, adaptive_damping=True)
    layer = tt.TheseusLayer(opt)
    values = dict(init_vals)
    if gnc:
        for mu in (1e5, 100.0, 10.0, 1.0):
            values["mu"] = jnp.asarray([[mu]], values["mu"].dtype if "mu" in values else jnp.float32)
            values, info = layer.forward(values)
    else:
        values, info = layer.forward(values)
    return values, info


def main(outlier_frac=0.3, n_per_edge=3, seed=0):
    dtype = jnp.float32
    gt = cube_trajectory(n_per_edge, dtype)
    n = gt.shape[0]
    key = jax.random.PRNGKey(99)
    init = lie.se3.compose(
        gt, lie.se3.exp(0.1 * jax.random.normal(key, (n, 1, 6), dtype=dtype)))
    init_vals = {f"pose_{i}": init[i] for i in range(n)}

    results = {}
    for mode in ("none", "welsch", "gnc"):
        obj, n_out = build_problem(gt, outlier_frac, seed, mode, dtype)
        values, info = solve(obj, gt, init_vals, gnc=(mode == "gnc"))
        results[mode] = ate(values, gt)
        print(f"{mode:7s}: ATE {results[mode]:.4f}  "
              f"({n_out} outlier closures, status {np.asarray(info.status)})")

    assert results["welsch"] < 0.8 * results["none"], \
        "robust solve should beat plain GN under outliers"
    assert results["gnc"] < 0.8 * results["none"], \
        "GNC solve should beat plain GN under outliers"
    print("ok: robust/GNC suppress outlier loop closures")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--outlier-frac", type=float, default=0.3)
    p.add_argument("--n-per-edge", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    import _config
    a = _config.parse_with_config(p)
    main(a.outlier_frac, a.n_per_edge, a.seed)
