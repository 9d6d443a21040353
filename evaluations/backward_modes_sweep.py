"""Backward-mode cost/accuracy sweep: time and FD-accuracy of outer-loop
gradients for unroll / implicit / truncated(k) / dlm.

Analog of the reference's paper Fig. 4 reproduction
(/root/reference/evaluations/backward_modes_tactile.sh:3-24, which sweeps
inner_optim.backward_mode and backward_num_iterations): the inner problem is
a batched SE3 pose-graph whose loop-closure-vs-odometry weight ratio is the
learnable outer parameter — gradients compare against central finite
differences of the outer loss. Run:

    python evaluations/backward_modes_sweep.py [--n-poses 16 --batch 4]

Writes evaluations/results_backward_modes.md.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

OUT = pathlib.Path(__file__).resolve().parent / "results_backward_modes.md"


def build(n_poses, batch, inner_iters, dtype=jnp.float64):
    """Objective with two edge classes — odometry (fixed weight 1) and loop
    closures (learnable named weight w_loop) — so the outer parameter theta
    controls a *relative* weight that actually moves the inner solution
    (uniformly scaling all weights leaves it invariant)."""
    import theseus_tpu as tt
    from theseus_tpu.embodied import Between, Local
    from theseus_tpu.utils.examples.pose_graph import (
        chain_edges, pose_values, synthetic_pose_graph)

    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=dtype)
    n_odo = n_poses - 1  # chain edges come first, then loop closures
    obj = tt.Objective(dtype=dtype)
    poses = [tt.SE3(name=f"pose_{i}") for i in range(n_poses)]
    obj.add(Local(poses[0], gt[0],
                  tt.ScaleCostWeight(jnp.asarray(10.0, dtype)), name="prior"))
    w_odo = tt.ScaleCostWeight(tt.Variable(jnp.ones((1, 1), dtype), name="w_odo"))
    w_loop = tt.ScaleCostWeight(tt.Variable(jnp.ones((1, 1), dtype), name="w_loop"))
    for ei, (i, j) in enumerate(edges):
        w = w_odo if ei < n_odo else w_loop
        obj.add(Between(poses[i], poses[j], meas[ei], cost_weight=w,
                        name=f"edge_{ei}"))

    opt = tt.GaussNewton(obj, max_iterations=inner_iters)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)
    gt_state = co.pack(obj.default_values(pose_values(gt)), batch)
    return layer, co, obj, values, state, gt_state, batch


def make_outer_loss(layer, co, obj, values, state, gt_state, batch,
                    mode, bwd_iters):
    """Outer loss: distance of the inner solution to ground truth, as a
    function of theta = the loop-closure weight."""
    opts = layer.optimizer.opts

    def loss(theta):
        vals = dict(values)
        vals["w_loop"] = theta * jnp.ones_like(values["w_loop"])
        aux = co.build_aux(vals, batch)
        carry = layer.solve_state(state, aux, mode, opts, bwd_iters)
        sol = carry["state"]
        d = jax.tree_util.tree_map(lambda a, b: jnp.sum((a - b) ** 2), sol, gt_state)
        return sum(jax.tree_util.tree_leaves(d))

    return loss


def main(n_poses, batch, inner_iters, append=False):
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
        dtype, h = jnp.float64, 1e-4
    else:  # TPU runs in f32: central-FD optimal step ~ cbrt(eps_f32)
        dtype, h = jnp.float32, 5e-3
    parts = build(n_poses, batch, inner_iters, dtype=dtype)
    theta = jnp.asarray(0.3, dtype)

    # FD reference from the implicit-parametrized loss (mode-independent fwd)
    f_ref = make_outer_loss(*parts, "implicit", 4)
    fd = (f_ref(theta + h) - f_ref(theta - h)) / (2 * h)
    print(f"FD reference grad: {float(fd):+.8f}")

    modes = [("unroll", None), ("implicit", None),
             ("truncated", 2), ("truncated", 4), ("truncated", 8),
             ("dlm", None)]
    rows = []
    for mode, k in modes:
        f = make_outer_loss(*parts, mode, k or 4)
        g_fn = jax.jit(jax.grad(f))
        t0 = time.time()
        g = float(np.asarray(g_fn(theta)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(g_fn(theta))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        rel = abs(g - float(fd)) / max(abs(float(fd)), 1e-12)
        label = f"{mode}" + (f"({k})" if k else "")
        rows.append((label, g, rel, ms, compile_s))
        print(f"{label:14s} grad {g:+.8f}  rel-err {rel:.2e}  "
              f"{ms:8.2f} ms/grad (compile {compile_s:.0f}s)", flush=True)

    platform = jax.devices()[0].platform
    mode_w = "a" if append else "w"
    with open(OUT, mode_w) as f:
        if mode_w == "w":
            f.write(
                "# Backward-mode sweep\n\n"
                "NOTE on reading 'rel err vs FD': the FD baseline itself "
                "carries O(h^2) + roundoff/h error at the run's dtype. At "
                "f32 with h=5e-3 that floor is ~2e-2 — a ~2e-2 column there "
                "measures FD noise, NOT mode error. The f64 tier (h=1e-4, "
                "floor ~1e-8) is the one that isolates true mode error.\n"
            )
        f.write(f"\n## PGO SE3 {n_poses} poses, batch {batch}, "
                f"{inner_iters} inner GN iters — {platform}, "
                f"{jnp.dtype(dtype).name}, FD h={h:g}\n\n")
        f.write(f"FD reference gradient: {float(fd):+.8f}\n\n")
        f.write("| mode | gradient | rel err vs FD | ms/grad | compile (s) |\n")
        f.write("|---|---|---|---|---|\n")
        for label, g, rel, ms, cs in rows:
            f.write(f"| {label} | {g:+.8f} | {rel:.2e} | {ms:.2f} | {cs:.0f} |\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--inner-iters", type=int, default=10)
    p.add_argument("--append", action="store_true",
                   help="append a section instead of rewriting the file")
    a = p.parse_args()
    main(a.n_poses, a.batch, a.inner_iters, a.append)
