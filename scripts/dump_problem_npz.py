"""Dump synthetic PGO / BA problems (the exact arrays our bench solves) to
.npz so scripts/bench_reference.py can build the SAME problem in the torch
reference — making every `vs reference` cell a same-problem, same-machine
comparison (VERDICT r3 item #1).

    python scripts/dump_problem_npz.py --problem pgo --poses 256 --batch 128 --out /tmp/pgo_256x128.npz
    python scripts/dump_problem_npz.py --problem ba --cams 16 --pts 200 --out /tmp/ba_16x200.npz

Shapes/seeds mirror bench.py / scripts/bench_sweep.py / scripts/bench_ba.py
(seed 0, same noise scales), so the dumped problem is the benchmarked one.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def dump_pgo(n_poses, batch, out, dtype):
    import jax.numpy as jnp

    from theseus_tpu.utils.examples.pose_graph import synthetic_pose_graph

    jdt = jnp.float32 if dtype == "float32" else jnp.float64
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=jdt
    )
    np.savez_compressed(
        out,
        problem="pgo",
        n_poses=n_poses,
        batch=batch,
        gt=np.asarray(gt),  # (N,B,3,4)
        edges=np.asarray(edges, np.int64),  # (E,2)
        measurements=np.asarray(meas),  # (E,B,3,4)
        init=np.asarray(init),  # (N,B,3,4)
        prior_weight=10.0,
    )


def dump_ba(cams, pts, batch, out, dtype):
    import jax.numpy as jnp

    from theseus_tpu.utils.examples.bundle_adjustment import synthetic_ba

    jdt = jnp.float32 if dtype == "float32" else jnp.float64
    prob = synthetic_ba(
        num_cameras=cams, num_points=pts, visibility=0.4, batch=batch, dtype=jdt
    )
    np.savez_compressed(
        out,
        problem="ba",
        poses=np.asarray(prob.poses),  # (C,B,3,4)
        points=np.asarray(prob.points),  # (P,B,3)
        focals=np.asarray(prob.focals),  # (C,B,1)
        k1=np.asarray(prob.k1),
        k2=np.asarray(prob.k2),
        obs_cam=np.asarray(prob.obs_cam),  # (O,)
        obs_pt=np.asarray(prob.obs_pt),  # (O,)
        obs_img=np.asarray(prob.obs_img),  # (O,B,2)
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problem", choices=["pgo", "ba"], required=True)
    p.add_argument("--poses", type=int, default=64)
    p.add_argument("--cams", type=int, default=16)
    p.add_argument("--pts", type=int, default=200)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    if args.problem == "pgo":
        dump_pgo(args.poses, args.batch, args.out, args.dtype)
    else:
        dump_ba(args.cams, args.pts, args.batch, args.out, args.dtype)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
