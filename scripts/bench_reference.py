"""Measure the reference theseus (torch CPU) on the SAME problems as our
benchmark sweep, at every sweep shape (VERDICT r3 item #1: the
"matching-or-beating" claim must be measured, not asserted, above 64x16).

    PYTHONPATH=/root/reference:/root/reference/torchlie:/root/reference/torchkin \
        python scripts/bench_reference.py --npz /tmp/pgo_256x128.npz --solver scipy_sparse

Problems come from scripts/dump_problem_npz.py (our exact benchmark arrays),
so both frameworks solve the identical problem; per-iteration error
trajectories are printed from both sides for iteration-work parity.

Solvers:
  dense        CholeskyDenseSolver (the reference default; O(n^3) per batch)
  scipy_sparse SparseLinearization + per-batch scipy SuperLU on AtA, f64 -
               the stand-in for CholmodSparseSolver (scikit-sparse is not
               installed in this env; CHOLMOD runs the same
               analyze-once/factor-per-solve loop per batch element on CPU,
               reference theseus/optimizer/linear/cholmod_sparse_solver.py:29,
               autograd/cholmod_sparse_autograd.py:44). SuperLU is LU not
               Cholesky, so this stand-in pays ~2x CHOLMOD's factor cost on
               SPD systems; ratios reported against it are conservative
               *against us* only if noted - see results_reference.md.

Timing is marginal per-iteration ((t(N2) - t(N1))/(N2 - N1), min over reps,
tolerances zeroed so no early exit), matching BENCH_SWEEP.md methodology.
"""

import argparse
import json
import time

import numpy as np
import scipy.sparse
import scipy.sparse.linalg
import torch

import theseus as th
from theseus.optimizer import SparseLinearization
from theseus.optimizer.linear import linear_solver
from theseus.optimizer.linear.utils import convert_to_alpha_beta_damping_tensors
from theseus.optimizer.nonlinear import levenberg_marquardt as lm_mod


class ScipySparseSolver(linear_solver.LinearSolver):
    """CPU sparse normal-equation solver: per-batch scipy SuperLU on
    AtA + damping (the CholmodSparseSolver loop with SuperLU in place of
    CHOLMOD). Forward-only (benchmarking under no_grad)."""

    def __init__(self, objective, linearization_cls=None, linearization_kwargs=None,
                 **kwargs):
        linearization_cls = linearization_cls or SparseLinearization
        super().__init__(objective, linearization_cls, linearization_kwargs, **kwargs)

    def solve(self, damping=None, ellipsoidal_damping=False, damping_eps=1e-8,
              **kwargs):
        lin = self.linearization
        structure = lin.structure()
        A_val = lin.A_val.double().cpu().numpy()
        b = lin.b.double().cpu().numpy()
        batch = A_val.shape[0]
        alpha, beta = convert_to_alpha_beta_damping_tensors(
            0.0 if damping is None else damping, damping_eps, ellipsoidal_damping,
            batch, torch.device("cpu"), torch.float64)
        alpha = alpha.numpy()
        beta = beta.numpy()
        out = np.empty((batch, structure.num_cols))
        for i in range(batch):
            A = structure.csr_straight(A_val[i])
            AtA = (A.T @ A).tocsc()
            diag = AtA.diagonal()
            AtA = AtA + scipy.sparse.diags(diag * alpha[i] + beta[i])
            Atb = A.T @ b[i]
            out[i] = scipy.sparse.linalg.splu(AtA.tocsc()).solve(Atb)
        return torch.from_numpy(out).to(lin.A_val)


# LM gates adaptive/ellipsoidal damping on solver type via module-level
# allow-lists (levenberg_marquardt.py:21-33); extend them so the sparse
# stand-in runs the same adaptive-LM semantics as our benchmark.
lm_mod._LM_ALLOWED_ELLIPS_DAMP_SOLVERS.append(ScipySparseSolver)
lm_mod._LM_ALLOWED_ADAPTIVE_DAMP_SOLVERS.append(ScipySparseSolver)


def build_pgo(data, dtype):
    n_poses = int(data["n_poses"])
    edges = data["edges"]
    meas = torch.as_tensor(np.asarray(data["measurements"]), dtype=dtype)
    gt0 = torch.as_tensor(np.asarray(data["gt"][0]), dtype=dtype)
    init = torch.as_tensor(np.asarray(data["init"]), dtype=dtype)
    prior_w = float(data["prior_weight"])

    objective = th.Objective(dtype=dtype)
    poses = [th.SE3(tensor=init[i].clone(), name=f"pose_{i}") for i in range(n_poses)]
    objective.add(
        th.Difference(
            poses[0], th.SE3(tensor=gt0), th.ScaleCostWeight(torch.tensor(prior_w, dtype=dtype)),
            name="prior",
        )
    )
    w = th.ScaleCostWeight(torch.tensor(1.0, dtype=dtype))
    for ei, (i, j) in enumerate(edges):
        m = th.SE3(tensor=meas[ei], name=f"meas_{ei}")
        objective.add(th.Between(poses[int(i)], poses[int(j)], m, w, name=f"e{ei}"))
    inputs = {f"pose_{i}": init[i] for i in range(n_poses)}
    return objective, inputs


def build_ba(data, dtype):
    poses = torch.as_tensor(np.asarray(data["poses"]), dtype=dtype)
    points = torch.as_tensor(np.asarray(data["points"]), dtype=dtype)
    focals = torch.as_tensor(np.asarray(data["focals"]), dtype=dtype)
    k1 = torch.as_tensor(np.asarray(data["k1"]), dtype=dtype)
    k2 = torch.as_tensor(np.asarray(data["k2"]), dtype=dtype)
    obs_cam = np.asarray(data["obs_cam"])
    obs_pt = np.asarray(data["obs_pt"])
    obs_img = torch.as_tensor(np.asarray(data["obs_img"]), dtype=dtype)

    objective = th.Objective(dtype=dtype)
    cam_vars = [th.SE3(tensor=poses[c].clone(), name=f"cam_{c}") for c in range(poses.shape[0])]
    pt_vars = [th.Point3(tensor=points[p].clone(), name=f"pt_{p}") for p in range(points.shape[0])]
    focal_vars = [th.Vector(tensor=focals[c], name=f"focal_{c}") for c in range(poses.shape[0])]
    k1_vars = [th.Vector(tensor=k1[c], name=f"k1_{c}") for c in range(poses.shape[0])]
    k2_vars = [th.Vector(tensor=k2[c], name=f"k2_{c}") for c in range(poses.shape[0])]
    w = th.ScaleCostWeight(torch.tensor(1.0, dtype=dtype))
    for o in range(len(obs_cam)):
        c, p = int(obs_cam[o]), int(obs_pt[o])
        objective.add(
            th.eb.Reprojection(
                camera_pose=cam_vars[c],
                world_point=pt_vars[p],
                image_feature_point=th.Point2(tensor=obs_img[o], name=f"feat_{o}"),
                focal_length=focal_vars[c],
                calib_k1=k1_vars[c],
                calib_k2=k2_vars[c],
                weight=w,
                name=f"obs_{o}",
            )
        )
    inputs = {f"cam_{c}": poses[c] for c in range(poses.shape[0])}
    inputs.update({f"pt_{p}": points[p] for p in range(points.shape[0])})
    return objective, inputs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz", required=True, help="problem from dump_problem_npz.py")
    p.add_argument("--solver", choices=["dense", "scipy_sparse"], default="dense")
    p.add_argument("--iters", type=int, default=10, help="N2 (marginal vs --iters-base)")
    p.add_argument("--iters-base", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--adaptive", action="store_true", default=True)
    p.add_argument("--no-adaptive", dest="adaptive", action="store_false")
    p.add_argument("--ellipsoidal", action="store_true",
                   help="ellipsoidal damping (our BA benchmark convention)")
    p.add_argument("--json", default=None, help="append one JSON line here")
    args = p.parse_args()

    torch.manual_seed(0)
    dtype = torch.float32 if args.dtype == "float32" else torch.float64
    data = np.load(args.npz)
    problem = str(data["problem"])
    t_build0 = time.perf_counter()
    if problem == "pgo":
        objective, inputs = build_pgo(data, dtype)
    else:
        objective, inputs = build_ba(data, dtype)
    build_s = time.perf_counter() - t_build0

    solver_cls = {"dense": th.CholeskyDenseSolver, "scipy_sparse": ScipySparseSolver}[args.solver]
    optimizer = th.LevenbergMarquardt(
        objective,
        linear_solver_cls=solver_cls,
        max_iterations=args.iters,
        step_size=1.0,
        abs_err_tolerance=0.0,  # no early exit: fixed-iteration marginal timing
        rel_err_tolerance=0.0,
        vectorize=True,
    )
    layer = th.TheseusLayer(optimizer)
    okw = {"damping": 1e-3, "adaptive_damping": args.adaptive,
           "ellipsoidal_damping": args.ellipsoidal}

    with torch.no_grad():
        # error-trajectory record (iteration-work parity vs our side)
        _, info = layer.forward(inputs, optimizer_kwargs={**okw, "track_err_history": True})
        err_hist = info.err_history.mean(dim=0).tolist()

        def timed(n_iter):
            optimizer.set_params(max_iterations=n_iter)
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                layer.forward(inputs, optimizer_kwargs=okw)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        timed(args.iters_base)  # warmup
        t1 = timed(args.iters_base)
        t2 = timed(args.iters)
    per_iter_ms = (t2 - t1) / (args.iters - args.iters_base) * 1e3

    rec = {
        "npz": args.npz,
        "problem": problem,
        "solver": args.solver,
        "dtype": args.dtype,
        "adaptive": args.adaptive,
        "ellipsoidal": args.ellipsoidal,
        "batch": int(objective.batch_size),
        "num_costs": len([c for c in objective.cost_functions.values()]),
        "build_s": round(build_s, 2),
        "per_iter_ms": round(per_iter_ms, 3),
        "total_s_base": round(t1, 3),
        "total_s_full": round(t2, 3),
        "err_history_mean": [float(f"{e:.6g}") for e in err_hist],
    }
    line = json.dumps(rec)
    print(line)
    if args.json:
        with open(args.json, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
