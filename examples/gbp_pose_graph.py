"""Gaussian Belief Propagation on a loopy SE2 pose graph.

Beyond-reference demo (the reference ships the ManifoldGaussian building
blocks, theseus/optimizer/manifold_gaussian.py:14, but no GBP solver):
solves a loop-closed odometry chain by synchronous message passing — every
factor-to-variable message in the graph is one batched step per sweep, the
schedule that maps to TPU vector units — and then reads out per-variable
posterior marginals, which direct solvers can't expose without a dense
inverse. Compares the GBP solution against Gauss-Newton and prints the
translation uncertainty of each pose.

Run: python examples/gbp_pose_graph.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax.numpy as jnp
import numpy as np

import argparse

import theseus_tpu as tt
from theseus_tpu.lie import se2

import _config


def build_graph(n, batch, seed, loop_closures):
    rng = np.random.default_rng(seed)
    gt_t, cur = [], np.zeros((batch, 3))
    for _ in range(n):
        gt_t.append(cur.copy())
        cur = cur + rng.normal(scale=0.5, size=(batch, 3)) * [1, 1, 0.5]
    gt = [se2.exp(jnp.asarray(t)) for t in gt_t]

    obj = tt.Objective()
    poses = [
        tt.SE2(
            tensor=se2.exp(
                jnp.asarray(gt_t[i] + rng.normal(scale=0.2, size=(batch, 3)))
            ),
            name=f"x{i}",
        )
        for i in range(n)
    ]
    obj.add(
        tt.Difference(
            poses[0], tt.SE2(tensor=gt[0], name="prior_t"),
            tt.ScaleCostWeight(100.0), name="prior",
        )
    )
    edges = [(i, i + 1) for i in range(n - 1)] + loop_closures
    for (i, j) in edges:
        meas = se2.compose(se2.inverse(gt[i]), gt[j])
        obj.add(
            tt.Between(
                poses[i], poses[j], tt.SE2(tensor=meas, name=f"m{i}_{j}"),
                tt.ScaleCostWeight(1.0), name=f"e{i}_{j}",
            )
        )
    return obj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=10)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--msg-iters", type=int, default=40)
    p.add_argument("--msg-damping", type=float, default=0.4)
    p.add_argument("--max-iterations", type=int, default=12)
    args = _config.parse_with_config(p)
    n = args.n_poses
    obj = build_graph(
        n, args.batch, args.seed,
        loop_closures=[(0, n - 1), (1, n // 2)],
    )

    gbp = tt.GaussianBeliefPropagation(
        obj,
        max_iterations=args.max_iterations,
        msg_iters=args.msg_iters,
        msg_damping=args.msg_damping,
    )
    out, info = gbp.optimize()
    print(f"GBP   final err: {np.asarray(info.last_err)}")

    gn = tt.GaussNewton(obj, max_iterations=args.max_iterations)
    out_gn, info_gn = gn.optimize()
    print(f"GN    final err: {np.asarray(info_gn.last_err)}")

    gap = max(
        float(jnp.max(jnp.abs(out[f"x{i}"] - out_gn[f"x{i}"])))
        for i in range(n)
    )
    print(f"max |GBP - GN| over poses: {gap:.2e}")
    assert gap < 1e-4, "GBP should reach the GN fixed point on this graph"

    # posterior marginals: translation std per pose (batch element 0),
    # monotone growth away from the anchored prior along the chain
    margs = gbp.marginals(values=out)
    stds = []
    for i in range(n):
        lam = np.asarray(margs[f"x{i}"].precision)[0]
        cov = np.linalg.inv(lam)
        stds.append(float(np.sqrt(cov[1, 1] + cov[2, 2])))
    print("translation std per pose:", " ".join(f"{s:.3f}" for s in stds))
    assert stds[0] < stds[n // 2], "anchored pose should be most certain"
    print("done")


if __name__ == "__main__":
    main()
