"""MFU estimate for the flagship PGO solve: XLA-counted FLOPs per LM
iteration / measured time / peak.

Uses the compiled executable's own cost analysis (XLA's flop count for the
exact HLO being run) rather than a hand model, so fused/eliminated work is
not double-counted. Run on the TPU:

    python scripts/mfu.py [--n-poses 256 --batch 128]

Notes: TPU v5e peak is 197 TFLOP/s bf16 / ~49 TFLOP/s fp32 (MXU passes).
The solver pins f32 matmul precision (config.SOLVER_MATMUL_PRECISION), so
MFU is reported against the fp32 peak; the bf16 number is shown for context.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from theseus_tpu.utils import fresh_eps

import bench

PEAK_F32 = 49.2e12  # v5e MXU fp32-equivalent
PEAK_BF16 = 197e12


def _analytic_flops_per_iter(layer):
    """Dominant per-iteration FLOPs: linearize (Between jac/err), AtA
    assembly products, level-sweep update GEMMs + POTRF/TRSM, the two
    substitution passes, and retract/error. Conservative (undercounts
    elementwise glue), so MFU is a mild overestimate of utilization."""
    opt = layer.optimizer
    co = opt.objective.compile()
    from theseus_tpu.optim.normal import SparseNormalBuilder

    bld = SparseNormalBuilder(co)
    sched = bld.sched
    d = bld.pattern.d
    bsz = None
    total = 0.0
    # batch size from a default pack
    vals = opt.objective.default_values({})
    bsz = co.resolve_batch_size(vals)

    # assembly: per bucket pair k * B * m * d * d MACs (x2 flops)
    for bi, sch in enumerate(bld.pattern.bucket_pair_sched):
        for (s, t, tgt, _, _) in sch:
            k = len(tgt)
            total += 2.0 * k * bsz * d * d * d  # m ~ d
        for g in bld.pattern.bucket_gvars[bi]:
            total += 2.0 * len(g) * bsz * d * d  # Atb
    # factorization level sweeps: update GEMMs sum_u d^3 per (col,row)
    for t in sched.level_tables:
        C, ul = t["upd_slots"].shape[0], t["upd_slots"].shape[1]
        rl = t["a_src"].shape[1]
        total += 2.0 * C * ul * rl * bsz * d**3
        total += C * bsz * (d**3 / 3.0)  # POTRF
        total += C * (rl - 1) * bsz * d**3  # TRSM
    # substitutions (fwd+bwd): one d^2 MAC per stored block per pass
    total += 2.0 * 2.0 * sched.sym.nnz_l * bsz * d * d
    # linearize + retract + error: ~ Between jac ~ 40 d^3-ish per edge
    n_edges = sum(len(s[0][2]) for s in bld.pattern.bucket_pair_sched if s)
    total += 2.0 * n_edges * bsz * 40 * d * d
    return total


def main(n_poses, batch, linearization, base=2, extra=8):
    layer, state, aux = bench.build(
        n_poses=n_poses, batch=batch, linearization=linearization)
    opts = layer.optimizer.opts

    import jax.numpy as jnp

    def make(n):
        def fwd(state, aux, eps):
            state = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(state, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    z = jnp.float32(0.0)
    lowered_a = jax.jit(make(base)).lower(state, aux, z)
    lowered_b = jax.jit(make(base + extra)).lower(state, aux, z)
    comp_a, comp_b = lowered_a.compile(), lowered_b.compile()

    def flops(comp):
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))

    df = (flops(comp_b) - flops(comp_a)) / extra  # flops per marginal LM iter
    if not (df > 0):
        # the remote-plugin cost analysis can come back empty; fall back to a
        # hand model of the dominant solver terms per iteration
        df = _analytic_flops_per_iter(layer)
        print("(cost_analysis empty; using analytic FLOP model)")

    def t(comp):
        # eps-perturbed per rep: the remote executor caches identical calls
        np.asarray(comp(state, aux, z))  # warm
        ts = []
        for i in range(5):
            eps = jnp.float32(fresh_eps(i))
            t0 = time.perf_counter()
            np.asarray(comp(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (t(comp_b) - t(comp_a)) / extra
    achieved = df / dt
    print(f"poses={n_poses} batch={batch} {linearization}: "
          f"{df/1e9:.3f} GFLOP/iter, {dt*1e3:.3f} ms/iter")
    print(f"achieved {achieved/1e12:.3f} TFLOP/s  "
          f"MFU {achieved/PEAK_F32*100:.2f}% of f32 peak "
          f"({achieved/PEAK_BF16*100:.2f}% of bf16 peak)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=256)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--linearization", default="sparse")
    a = p.parse_args()
    main(a.n_poses, a.batch, a.linearization)
