"""GBP on-hardware timing (VERDICT r3 weak #5: GBP had convergence data but
no TPU timing). Measures marginal per-message-sweep ms on SE3 PGO at 64 and
256 poses (the sweeps/sec envelope), plus the direct sparse-LM per-iteration
time on the same problems, and appends the comparison to results_gbp.md.

    python evaluations/gbp_hw_bench.py
"""

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils import fresh_eps

OUT = pathlib.Path(__file__).resolve().parent / "results_gbp.md"


def build(n_poses, batch, optimizer="gbp", msg_iters=10, dtype=jnp.float32):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import (build_pgo_objective,
                                                       pose_values,
                                                       synthetic_pose_graph)

    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=dtype)
    obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0], dtype=dtype)
    if optimizer == "gbp":
        opt = tt.GaussianBeliefPropagation(obj, msg_iters=msg_iters,
                                           max_iterations=10)
    else:
        opt = tt.LevenbergMarquardt(obj, max_iterations=10,
                                    adaptive_damping=True,
                                    linearization="sparse")
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    return layer, state, aux


def time_solve(layer, state, aux, opts, n_outer, reps=3):
    @jax.jit
    def fwd(state, aux, eps):
        st = {k: v * (1.0 + eps) for k, v in state.items()}
        carry = layer.optimizer.init_carry(st, aux, opts)
        carry = layer.optimizer.run_scan(carry, aux, n_outer, opts)
        return carry["err"]

    np.asarray(fwd(state, aux, jnp.float32(0)))
    ts = []
    for i in range(reps):
        eps = jnp.float32(fresh_eps(i))
        t0 = time.perf_counter()
        np.asarray(fwd(state, aux, eps))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    platform = jax.devices()[0].platform
    rows = []
    for n_poses, batch in [(64, 16), (256, 128)]:
        # GBP: marginal sweep cost = (t(msg_iters=40) - t(msg_iters=10)) / 30
        # over a fixed 4-outer-iteration solve
        layer, state, aux = build(n_poses, batch, "gbp")
        o10 = dataclasses.replace(layer.optimizer.opts, msg_iters=10)
        o40 = dataclasses.replace(layer.optimizer.opts, msg_iters=40)
        t10 = time_solve(layer, state, aux, o10, 4)
        t40 = time_solve(layer, state, aux, o40, 4)
        ms_sweep = (t40 - t10) / (30 * 4) * 1e3
        # whole outer iteration at msg_iters=10 (marginal over outer iters)
        t4 = time_solve(layer, state, aux, o10, 4)
        t12 = time_solve(layer, state, aux, o10, 12)
        ms_outer_gbp = (t12 - t4) / 8 * 1e3

        layer2, state2, aux2 = build(n_poses, batch, "lm")
        t4 = time_solve(layer2, state2, aux2, layer2.optimizer.opts, 4)
        t12 = time_solve(layer2, state2, aux2, layer2.optimizer.opts, 12)
        ms_lm = (t12 - t4) / 8 * 1e3
        rows.append((n_poses, batch, ms_sweep, ms_outer_gbp, ms_lm))
        print(f"poses={n_poses} batch={batch}: {ms_sweep:.3f} ms/sweep "
              f"({1e3/ms_sweep:.0f} sweeps/s), GBP outer {ms_outer_gbp:.2f} ms "
              f"(10 sweeps), direct LM {ms_lm:.2f} ms/iter", flush=True)

    with open(OUT, "a") as f:
        f.write(f"\n## On-hardware timing ({platform}, f32, batched SE3 PGO)\n\n")
        f.write("Marginal per-sweep cost ((t(40 sweeps)-t(10 sweeps))/30 inside a\n")
        f.write("fixed 4-outer-iteration jitted solve, min over reps, cache-proof\n")
        f.write("eps perturbation) vs the direct sparse-LM per-iteration time on\n")
        f.write("the same problem:\n\n")
        f.write("| poses | batch | ms/sweep | sweeps/s | GBP ms/outer-iter (10 sweeps) | direct LM ms/iter | GBP/LM cost ratio |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for n, b, s, og, lm in rows:
            f.write(f"| {n} | {b} | {s:.3f} | {1e3/s:.0f} | {og:.2f} | {lm:.2f} | {og/lm:.1f}x |\n")
        f.write("\nScaling envelope: one synchronous sweep is one batched step over\n")
        f.write("every factor (no sequential elimination), so per-sweep cost scales\n")
        f.write("O(E/chips) under factor sharding while the direct solver's level\n")
        f.write("sweeps are serial in depth. On ONE chip GBP needs ~10 sweeps per\n")
        f.write("outer iteration to match a GN step on loopy graphs (table above),\n")
        f.write("so it does not beat the direct solver at any single-chip PGO shape\n")
        f.write("measured here — its value is (a) per-variable marginals and (b)\n")
        f.write("the problem-axis sharding dryrun (scripts/dryrun_gbp_shard.py).\n")
    print("appended to", OUT)


if __name__ == "__main__":
    main()
