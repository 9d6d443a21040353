"""Measure the reference theseus (torch CPU) on the same PGO problem shape
as bench.py, to calibrate BASELINE_REF_MS. Run manually:

    PYTHONPATH=/root/reference python scripts/bench_reference.py
"""

import time

import numpy as np
import torch

import theseus as th

N_POSES = 64
BATCH = 16
N_ITERS = 10


def main():
    torch.manual_seed(0)
    dtype = torch.float32
    gt = [torch.eye(3, 4, dtype=dtype).unsqueeze(0).repeat(BATCH, 1, 1)]
    gt_se3 = [th.SE3(tensor=gt[0])]
    for i in range(1, N_POSES):
        step = th.SE3.exp_map(0.3 * torch.randn(BATCH, 6, dtype=dtype))
        gt_se3.append(th.SE3(tensor=gt_se3[-1].compose(step).tensor))

    objective = th.Objective(dtype=dtype)
    poses = [th.SE3(tensor=gt_se3[i].tensor.clone(), name=f"pose_{i}") for i in range(N_POSES)]
    w = th.ScaleCostWeight(torch.tensor(1.0, dtype=dtype))
    objective.add(
        th.Difference(poses[0], gt_se3[0], th.ScaleCostWeight(torch.tensor(10.0, dtype=dtype)), name="prior")
    )
    edges = [(i, i + 1) for i in range(N_POSES - 1)] + [(N_POSES - 1, 0), (0, N_POSES // 2)]
    for ei, (i, j) in enumerate(edges):
        rel = gt_se3[i].inverse().compose(gt_se3[j])
        nz = th.SE3.exp_map(0.05 * torch.randn(BATCH, 6, dtype=dtype))
        meas = th.SE3(tensor=rel.compose(nz).tensor, name=f"meas_{ei}")
        objective.add(th.Between(poses[i], poses[j], meas, w, name=f"e{ei}"))

    optimizer = th.LevenbergMarquardt(
        objective,
        linear_solver_cls=th.CholeskyDenseSolver,
        max_iterations=N_ITERS,
        step_size=1.0,
        vectorize=True,
    )
    layer = th.TheseusLayer(optimizer)

    inputs = {
        f"pose_{i}": gt_se3[i].compose(th.SE3.exp_map(0.2 * torch.randn(BATCH, 6, dtype=dtype))).tensor
        for i in range(N_POSES)
    }
    with torch.no_grad():
        layer.forward(inputs, optimizer_kwargs={"adaptive_damping": True, "damping": 1e-3})  # warmup
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            layer.forward(inputs, optimizer_kwargs={"adaptive_damping": True, "damping": 1e-3})
            ts.append(time.perf_counter() - t0)
    per_iter_ms = min(ts) / N_ITERS * 1e3
    print(f"reference per-LM-iter: {per_iter_ms:.3f} ms (total {min(ts):.3f}s)")


if __name__ == "__main__":
    main()
