"""Autodiff-mode ablation: analytic vs jacfwd vs jacrev cost jacobians.

The analog of the reference's autodiff_cost_function_ablation.sh
(examples/pose_graph/autodiff_cost_function_ablation.sh — torch DENSE /
LOOP_BATCH / VMAP autograd modes on homography estimation). In the rebuild
the one vmapped tangent-space mode replaces the reference's three; the
remaining axis is forward- vs reverse-mode AD and analytic-vs-AD, ablated
here on two residual shapes:

- reprojection (dim 2, two vars of dof 6+3): rev-friendly shape
- photometric patch (dim 64, dof 8): fwd-friendly shape

Run: python evaluations/autodiff_ablation.py  (CPU or TPU)
Appends results to evaluations/results_autodiff.md.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.lie import se3

OUT = pathlib.Path(__file__).resolve().parent / "results_autodiff.md"


def time_linearize(obj, values, reps=5):
    co = obj.compile()
    b = co.resolve_batch_size(values)
    state = co.pack(obj.default_values(values), b)
    aux = co.build_aux(obj.default_values(values), b)
    f = jax.jit(lambda s, a: co.linearize_blocks(s, a))
    jax.tree_util.tree_map(np.asarray, f(state, aux))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, f(state, aux))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def reprojection_objective(mode, n=64, batch=8):
    key = jax.random.PRNGKey(0)
    cam = tt.SE3(name="cam")
    pts = [tt.Point3(name=f"p{i}") for i in range(n)]
    obj = tt.Objective()
    uv = jax.random.normal(key, (batch, 2))

    def err_fn(optim, aux):
        g, p = optim
        (target,) = aux
        pc = se3.transform(g, p)
        return -pc[:2] / pc[2:] - target

    for i, p in enumerate(pts):
        if mode == "analytic":
            obj.add(tt.Reprojection(
                cam, p, tt.Variable(jnp.full((batch, 1), 1.0), name=f"f{i}"),
                tt.Variable(uv, name=f"uv{i}"), name=f"c{i}"))
        else:
            obj.add(tt.AutoDiffCostFunction(
                [cam, p], 2, err_fn,
                aux_vars=[tt.Variable(uv, name=f"uv{i}")],
                autograd_mode=mode, name=f"c{i}"))
    vals = {"cam": jnp.broadcast_to(jnp.eye(3, 4), (batch, 3, 4))}
    for i in range(n):
        vals[f"p{i}"] = jnp.asarray([[0.1 * i - 3, 0.0, 5.0]]) * jnp.ones((batch, 1))
    return obj, vals


def photometric_objective(mode, n=32, batch=8, patch=8):
    key = jax.random.PRNGKey(1)
    h = tt.Vector(8, name="h")
    obj = tt.Objective()

    def err_fn(optim, aux):
        (h8,) = optim
        (pix,) = aux
        # toy homography-warped photometric residual: project patch coords
        xy = pix[:, :2]
        w = 1.0 + xy @ h8[6:8]
        uv = (xy @ h8[:2].reshape(2, 1) + h8[2] + xy @ h8[3:5].reshape(2, 1) + h8[5])
        return (uv / w[:, None]).reshape(-1)[: pix.shape[0]] - pix[:, 2]

    for i in range(n):
        pix = jax.random.normal(jax.random.fold_in(key, i), (batch, patch * patch, 3))
        obj.add(tt.AutoDiffCostFunction(
            [h], patch * patch, err_fn,
            aux_vars=[tt.Variable(pix, name=f"pix{i}")],
            autograd_mode=mode, name=f"c{i}"))
    return obj, {"h": jnp.zeros((batch, 8)).at[:, 0].set(1.0).at[:, 4].set(1.0)}


def main():
    rows = []
    for mode in ("analytic", "fwd", "rev"):
        obj, vals = reprojection_objective(mode)
        rows.append(("reprojection dim2", mode, time_linearize(obj, vals)))
        print(rows[-1], flush=True)
    for mode in ("fwd", "rev"):
        obj, vals = photometric_objective(mode)
        rows.append(("photometric dim64", mode, time_linearize(obj, vals)))
        print(rows[-1], flush=True)

    with open(OUT, "a") as f:
        f.write(f"\n## autodiff ablation ({jax.default_backend()})\n\n")
        f.write("| residual | mode | linearize ms |\n|---|---|---|\n")
        for shape, mode, ms in rows:
            f.write(f"| {shape} | {mode} | {ms:.3f} |\n")
    print(f"appended to {OUT}")


if __name__ == "__main__":
    main()
