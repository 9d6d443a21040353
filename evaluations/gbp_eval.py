"""GBP convergence evaluation: synchronous sweeps needed to reach the
direct solver's Gauss-Newton step on loopy SE2 pose graphs, vs graph size
and message damping. CPU f64 (methodology note: this measures ALGORITHMIC
convergence; per-sweep wall time on TPU is one batched step over every
factor, see theseus_tpu/optim/gbp.py).

    python evaluations/gbp_eval.py

Writes evaluations/results_gbp.md.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

OUT = pathlib.Path(__file__).resolve().parent / "results_gbp.md"


def build(n, batch=1, seed=0, closures=4):
    import theseus_tpu as tt
    from theseus_tpu.lie import se2

    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(seed)
    gt_t, cur = [], np.zeros((batch, 3))
    for _ in range(n):
        gt_t.append(cur.copy())
        cur = cur + rng.normal(scale=0.4, size=(batch, 3))
    gt = [se2.exp(jnp.asarray(t)) for t in gt_t]
    obj = tt.Objective(dtype=jnp.float64)
    poses = [
        tt.SE2(
            tensor=se2.exp(
                jnp.asarray(gt_t[i] + rng.normal(scale=0.15, size=(batch, 3)))
            ),
            name=f"x{i}",
        )
        for i in range(n)
    ]
    obj.add(tt.Difference(poses[0], tt.SE2(tensor=gt[0], name="pt"),
                          tt.ScaleCostWeight(10.0), name="prior"))
    edges = [(i, i + 1) for i in range(n - 1)]
    for c in range(closures):
        i = int(rng.integers(0, n - 2))
        j = int(rng.integers(i + 1, n))
        edges.append((i, j))
    for (i, j) in set(edges):
        meas = se2.compose(se2.inverse(gt[i]), gt[j])
        obj.add(tt.Between(poses[i], poses[j],
                           tt.SE2(tensor=meas, name=f"m{i}_{j}"),
                           tt.ScaleCostWeight(1.0), name=f"e{i}_{j}"))
    return obj


def step_quality(obj, damping, sweep_grid=(10, 40, 160)):
    """Relative L2 error of the GBP step vs the direct GN step."""
    from theseus_tpu.optim.gbp import GBPNormalBuilder
    from theseus_tpu.optim.normal import DenseNormalBuilder

    co = obj.compile()
    values = obj.default_values()
    b = co.resolve_batch_size(values)
    state, aux = co.pack(values, b), co.build_aux(values, b)
    d_ref, _ = DenseNormalBuilder(co).build(state, aux).solve(0.0, False)
    ref_norm = float(jnp.linalg.norm(d_ref))
    rels = []
    for sweeps in sweep_grid:
        bld = GBPNormalBuilder(co, msg_iters=sweeps, msg_damping=damping,
                               ridge=1e-12)
        d, _ = bld.build(state, aux).solve(0.0, False)
        rels.append(float(jnp.linalg.norm(d - d_ref)) / ref_norm)
    return rels


def outer_convergence(obj, sweeps=40, damping=0.3, iters=15):
    """Final 0.5||r||^2 of GBP-as-nonlinear-solver vs Gauss-Newton: inexact
    steps still reach the optimum (inexact-Newton argument)."""
    import theseus_tpu as tt

    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=iters, msg_iters=sweeps, msg_damping=damping
    )
    _, info_g = gbp.optimize()
    gn = tt.GaussNewton(obj, max_iterations=iters)
    _, info_n = gn.optimize()
    return float(jnp.max(info_g.last_err)), float(jnp.max(info_n.last_err))


def main():
    step_rows, outer_rows = [], []
    for n in (16, 64, 256):
        obj = build(n)
        for damping in (0.0, 0.3):
            rels = step_quality(obj, damping)
            step_rows.append((n, damping, rels))
            print(f"n={n} damping={damping}: rel err vs GN step "
                  f"@10/40/160 sweeps = "
                  + "/".join(f"{r:.1e}" for r in rels), flush=True)
        eg, en = outer_convergence(obj)
        outer_rows.append((n, eg, en))
        print(f"n={n}: outer final err GBP={eg:.2e} GN={en:.2e}", flush=True)

    with open(OUT, "w") as f:
        f.write("# GBP evaluation (loopy SE2 PGO, 4 random loop closures, "
                "CPU f64)\n\n")
        f.write("## Linear step quality\n\nRelative L2 error of the GBP "
                "step vs the direct Gauss-Newton step.\nEach sweep is ONE "
                "batched device step over all factors regardless of\ngraph "
                "size; information travels ~one edge per sweep.\n\n")
        f.write("| poses | msg damping | 10 sweeps | 40 | 160 |\n")
        f.write("|---|---|---|---|---|\n")
        for n, dmp, rels in step_rows:
            f.write(f"| {n} | {dmp} | " +
                    " | ".join(f"{r:.1e}" for r in rels) + " |\n")
        f.write("\n## Nonlinear (outer) convergence\n\nGBP is an INEXACT "
                "step inside the standard relinearize loop — percent-level\n"
                "step error does not prevent convergence to the same "
                "optimum (classic\ninexact-Newton behavior):\n\n")
        f.write("| poses | GBP(40 sweeps, damping .3) final err | GN final "
                "err |\n|---|---|---|\n")
        for n, eg, en in outer_rows:
            f.write(f"| {n} | {eg:.2e} | {en:.2e} |\n")
        f.write("\nUse GBP when you want the per-variable posterior "
                "marginals it exposes\n(optim/gbp.py marginals(), layer."
                "compute_covariances) or a fully\ndistributable solver; use "
                "the direct sparse backend for raw speed on a\nsingle "
                "chip.\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
