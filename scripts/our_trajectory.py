"""Run OUR solver on a dump_problem_npz.py problem and print the same
record bench_reference.py prints (per-iteration mean error history +
marginal per-iteration ms) — the two sides of the iteration-work-parity
check for evaluations/results_reference.md.

    python scripts/our_trajectory.py --npz /tmp/pgo_256x128.npz
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils import fresh_eps


def build_pgo(data, dtype):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import (build_pgo_objective,
                                                       pose_values)

    n_poses = int(data["n_poses"])
    edges = [tuple(e) for e in np.asarray(data["edges"])]
    obj, _ = build_pgo_objective(
        n_poses, edges, jnp.asarray(data["measurements"], dtype),
        jnp.asarray(data["gt"][0], dtype), dtype=dtype,
        prior_weight=float(data["prior_weight"]),
    )
    values = pose_values(np.asarray(data["init"], dtype))
    opt_kwargs = dict(adaptive_damping=True)
    return obj, values, int(data["batch"]), opt_kwargs


def build_ba(data, dtype):
    from theseus_tpu.utils.examples.bundle_adjustment import (BAProblem,
                                                              ba_values,
                                                              build_ba_objective)

    def j(x):
        return jnp.asarray(np.asarray(x), dtype)

    prob = BAProblem(
        poses=j(data["poses"]), points=j(data["points"]), focals=j(data["focals"]),
        k1=j(data["k1"]), k2=j(data["k2"]),
        obs_cam=np.asarray(data["obs_cam"]), obs_pt=np.asarray(data["obs_pt"]),
        obs_img=j(data["obs_img"]),
    )
    obj, _, _ = build_ba_objective(prob, dtype=dtype)
    values = ba_values(prob)
    opt_kwargs = dict(adaptive_damping=True, ellipsoidal_damping=True)
    return obj, values, int(data["poses"].shape[1]), opt_kwargs


def _apply_damping_override(opt_kwargs, args):
    if args.no_ellipsoidal:
        opt_kwargs["ellipsoidal_damping"] = False
    return opt_kwargs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz", required=True)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--iters-base", type=int, default=2)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--linearization", default="sparse")
    p.add_argument("--json", default=None)
    p.add_argument(
        "--x64", action="store_true",
        help="enable jax x64 so the refinement tier (sparse/refine.py) "
        "accumulates residuals in f64 — the reference's f64-solve contract "
        "(problem dtype stays --dtype, f32 by default, like the reference's "
        "f32 problem / f64 solve convention)",
    )
    p.add_argument(
        "--refine", type=int, default=None,
        help="override config.REFINE_STEPS (refinement sweeps per solve)",
    )
    p.add_argument(
        "--no-ellipsoidal", action="store_true",
        help="BA only: plain adaptive damping instead of ellipsoidal - the "
        "reference's sparse path cannot run ellipsoidal (its adaptive "
        "accept path asserts), so this gives the apples-to-apples "
        "trajectory comparison",
    )
    args = p.parse_args()

    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import theseus_tpu as tt

    if args.refine is not None:
        from theseus_tpu import config as _cfg

        _cfg.set_refine_steps(args.refine)

    dtype = jnp.float32 if args.dtype == "float32" else jnp.float64
    data = np.load(args.npz)
    problem = str(data["problem"])
    builder = build_pgo if problem == "pgo" else build_ba
    obj, values, batch, opt_kwargs = builder(data, dtype)
    opt_kwargs = _apply_damping_override(opt_kwargs, args)
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=args.iters, linearization=args.linearization,
        **opt_kwargs,
    )
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    _, info = layer.forward(values, optimizer_kwargs={"track_err_history": True})
    values = obj.default_values(values)
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    err_hist = np.asarray(info.err_history).mean(axis=1)  # (iters+1, B) -> per-iter
    err_hist = [float(f"{e:.6g}") for e in err_hist]

    opts = layer.optimizer.opts

    def make(n):
        from theseus_tpu.utils.hoist import hoist_jit

        @hoist_jit
        def fwd(state, aux, eps):
            st = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(st, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    f_a, f_b = make(args.iters_base), make(args.iters)
    z = jnp.asarray(0, dtype)
    np.asarray(f_a(state, aux, z)); np.asarray(f_b(state, aux, z))

    def t(f):
        ts = []
        for i in range(3):
            eps = jnp.asarray(fresh_eps(i), dtype)
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_iter_ms = (t(f_b) - t(f_a)) / (args.iters - args.iters_base) * 1e3
    from theseus_tpu import config as _cfg

    rec = {
        "npz": args.npz, "problem": problem, "framework": "theseus_tpu",
        "platform": jax.devices()[0].platform, "dtype": args.dtype,
        "linearization": args.linearization, "batch": batch,
        "x64": bool(jax.config.jax_enable_x64),
        "refine_steps": int(_cfg.REFINE_STEPS),
        "ellipsoidal": bool(opt_kwargs.get("ellipsoidal_damping", False)),
        "per_iter_ms": round(per_iter_ms, 4),
        "err_history_mean": err_hist,
    }
    line = json.dumps(rec)
    print(line)
    if args.json:
        with open(args.json, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
