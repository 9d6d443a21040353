"""Backward-mode ablation on the TACTILE learning task — the reference's
actual paper-Fig.-4 vehicle (/root/reference/evaluations/backward_modes_tactile.sh:3-24
sweeps inner_optim.backward_mode x backward_num_iterations on tactile pose
estimation with learned measurement/weight models).

Per mode {unroll, implicit, truncated-5, truncated-10, dlm} x inner iters:
  - ms/grad: jitted value_and_grad of the full outer loss (learned MLP
    measurement + weight models through the LM solve), marginal over reps
  - f64 gradient accuracy vs central finite differences (scalar weight knob)
  - 10-step learning run: outer loss trajectory

    python evaluations/backward_modes_tactile.py [--time-steps 10]

Writes evaluations/results_backward_modes_tactile.md.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

OUT = pathlib.Path(__file__).resolve().parent / "results_backward_modes_tactile.md"

MODES = [("unroll", 0), ("implicit", 0), ("truncated", 5), ("truncated", 10),
         ("dlm", 0)]


def make_inputs(est, dtype=jnp.float64):
    """Synthetic straight-push episode (same construction as
    tests/embodied/test_tactile.py)."""
    from theseus_tpu.embodied import occupancy_to_sdf
    from theseus_tpu.lie import se2

    t = est.time_steps
    xs = jnp.linspace(0.1, 0.2, t, dtype=dtype)
    obj_gt = jnp.stack([xs, jnp.full_like(xs, 0.16), jnp.ones_like(xs),
                        jnp.zeros_like(xs)], -1)
    eff_gt = obj_gt.at[:, 0].add(-0.03)
    occ = np.zeros((32, 32))
    occ[12:20, 12:20] = 1.0
    sdf = occupancy_to_sdf(occ, 0.01)
    inputs = {"obj_start_pose": obj_gt[:1], "sdf_data": jnp.asarray(sdf)[None]}
    for i in range(t):
        inputs[f"motion_capture_{i}"] = eff_gt[i][None]
        inputs[f"obj_pose_{i}"] = obj_gt[0][None]
        inputs[f"eff_pose_{i}"] = eff_gt[i][None]
    return inputs, obj_gt


def build(time_steps, inner_iters, dtype):
    from theseus_tpu.utils.examples.tactile_pose_estimation import (
        TactilePoseEstimator, TactileTrainer)

    est = TactilePoseEstimator(time_steps=time_steps,
                               max_iterations=inner_iters, dtype=dtype)
    base, obj_gt = make_inputs(est, dtype)
    feat_dim = 6
    key = jax.random.PRNGKey(0)
    feats = {i: jnp.asarray(jax.random.normal(jax.random.fold_in(key, i),
                                              (1, feat_dim)), dtype)
             for i in range(time_steps)}
    trainer = TactileTrainer(est, feat_dim, key=key, lr=1e-3)
    return est, trainer, base, feats, obj_gt


def loss_fn(trainer, est, mode, bwd_iters):
    co = est.objective.compile()

    def loss(params, theta, base_inputs, features, obj_gt):
        inputs = trainer.build_inputs(base_inputs, params, features)
        # scalar knob on the learned weight for FD checks: gradients wrt
        # theta flow through exactly the same solve as the params gradients
        inputs["mf_between_weight"] = inputs["mf_between_weight"] * theta
        values = est.objective.default_values(inputs)
        bsz = co.resolve_batch_size(values)
        state = co.pack(values, bsz)
        aux = co.build_aux(values, bsz)
        carry = est.layer.solve_state(
            state, aux, mode, est.optimizer.opts,
            backward_num_iterations=bwd_iters or 5,
        )
        sol = co.unpack(carry["state"])
        t = est.time_steps
        pred = jnp.stack([sol[f"obj_pose_{i}"] for i in range(t)], axis=1)
        return jnp.mean((pred[..., :2] - obj_gt[None, :, :2]) ** 2)

    return loss


def run_mode(mode, bwd_iters, time_steps, inner_iters, dtype, reps=3):
    est, trainer, base, feats, obj_gt = build(time_steps, inner_iters, dtype)
    loss = loss_fn(trainer, est, mode, bwd_iters)
    one = jnp.asarray(1.0, dtype)

    vgrad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    val, (gp, gtheta) = vgrad(trainer.params, one, base, feats, obj_gt)
    jax.block_until_ready(gp)

    # FD accuracy on the scalar knob (central; meaningful on f64 — on f32
    # the FD floor dominates and rel_err is labeled as such in the table)
    eps = 1e-6 if dtype == jnp.float64 else 1e-3
    lp = float(loss(trainer.params, one + eps, base, feats, obj_gt))
    lm = float(loss(trainer.params, one - eps, base, feats, obj_gt))
    fd = (lp - lm) / (2 * eps)
    g = float(gtheta)
    rel = abs(g - fd) / max(abs(fd), 1e-12)

    # grad timing (perturb theta per call: remote executors cache
    # bit-identical calls)
    ts = []
    for i in range(reps):
        th = one + jnp.asarray(1e-9 * (i + 1), dtype)
        t0 = time.perf_counter()
        v, (gp, gt_) = vgrad(trainer.params, th, base, feats, obj_gt)
        np.asarray(gt_)
        ts.append(time.perf_counter() - t0)
    ms_grad = min(ts) * 1e3

    # short learning run
    params = trainer.params
    losses = [float(val)]
    lr = 1e-2
    for _ in range(10):
        v, (gp, _) = vgrad(params, one, base, feats, obj_gt)
        params = jax.tree_util.tree_map(lambda p, gg: p - lr * gg, params, gp)
        losses.append(float(v))

    return {"mode": mode if not bwd_iters else f"{mode}-{bwd_iters}",
            "inner_iters": inner_iters, "grad": g, "fd": fd, "rel_err": rel,
            "ms_grad": ms_grad, "loss0": losses[0], "loss10": losses[-1]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--time-steps", type=int, default=10)
    p.add_argument("--inner-iters", type=int, nargs="+", default=[3, 10, 20])
    p.add_argument("--f32", action="store_true",
                   help="f32 (TPU hardware-timing tier; FD column is noise-floored)")
    p.add_argument("--out-suffix", default="")
    args = p.parse_args(argv)

    dtype = jnp.float32 if args.f32 else jnp.float64
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    platform = jax.devices()[0].platform
    rows = []
    for inner in args.inner_iters:
        for mode, bwd in MODES:
            try:
                r = run_mode(mode, bwd, args.time_steps, inner, dtype)
            except Exception as e:
                print(f"{mode}-{bwd} inner={inner}: FAILED {type(e).__name__}: {e}")
                rows.append({"mode": f"{mode}-{bwd}" if bwd else mode,
                             "inner_iters": inner, "rel_err": float("nan"),
                             "ms_grad": float("nan"),
                             "loss0": float("nan"), "loss10": float("nan"),
                             "note": f"failed ({type(e).__name__})"})
                continue
            rows.append(r)
            print(f"[{platform}] inner={inner:3d} {r['mode']:<12s} "
                  f"ms/grad={r['ms_grad']:9.2f} rel_err={r['rel_err']:.2e} "
                  f"loss {r['loss0']:.4e} -> {r['loss10']:.4e}", flush=True)

    out_path = OUT if not args.out_suffix else OUT.with_name(
        OUT.stem + args.out_suffix + ".md")
    with open(out_path, "w") as f:
        f.write("# Backward modes on the tactile learning task\n\n")
        f.write(f"Platform: {platform}, {'f32' if args.f32 else 'f64'}. "
                "Outer loss: MSE of estimated object\n")
        f.write("trajectory vs ground truth, learned MLP measurement+weight models\n")
        f.write("through the LM solve (reference Fig. 4 vehicle,\n")
        f.write("evaluations/backward_modes_tactile.sh). rel_err = gradient vs\n")
        f.write("central FD (1e-6) on a scalar weight knob.\n\n")
        f.write("| inner iters | mode | ms/grad | grad rel err vs FD | loss step0 | loss step10 |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows:
            note = r.get("note", "")
            f.write(f"| {r['inner_iters']} | {r['mode']}{' ' + note if note else ''} | "
                    f"{r['ms_grad']:.2f} | {r['rel_err']:.2e} | "
                    f"{r['loss0']:.4e} | {r['loss10']:.4e} |\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
