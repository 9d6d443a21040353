"""Interleaved A/B: lane-folded Pallas linearization kernels
(config.PALLAS_LANE_FOLD, ops/pallas_between_soa.py /
ops/pallas_reprojection.py) vs the round-4 128-lane-padded layout, on the
SAME problem in the same session.

Folding removes Mosaic's 128/b lane-padding HBM inflation at batch < 128
(mandatory at BA 256x8000 batch 1, where the padded layout OOMs the chip)
at the cost of two XLA transposes around each kernel. Whether it WINS at
the small PGO shapes is an empirical question this script answers the
cache-proof way: both arms compiled up front, timing rounds interleaved
(the chip drifts ~±20% with recent activity — sequential runs confound
arm with time).

    python scripts/ab_lane_fold.py --shapes 64x16 2500x1 2048x8
    python scripts/ab_lane_fold.py --ba 16x200            # reprojection

The gate is read at TRACE time, so each arm builds its own jitted pair.
Numeric equivalence is pinned by tests/optim/test_pallas_kernels.py
(fold regimes parameterized) and scripts/tpu_golden.py (bit-identical
end-to-end on the chip, 2026-08-20).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from theseus_tpu import config
from theseus_tpu.utils import fresh_eps
from theseus_tpu.utils.hoist import hoist_jit


def compiled_pair(layer, state, aux, base, extra):
    opts = layer.optimizer.opts

    def make(n):
        @hoist_jit
        def fwd(state, aux, eps):
            st = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(st, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    z = jnp.float32(0)
    c_a = make(base).lower(state, aux, z).compile()
    c_b = make(base + extra).lower(state, aux, z).compile()
    np.asarray(c_a(state, aux, z))
    np.asarray(c_b(state, aux, z))
    return c_a, c_b


def build_pgo(n_poses, batch):
    import bench

    return bench.build(n_poses=n_poses, batch=batch)


def build_ba(cams, pts):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, synthetic_ba)

    prob = synthetic_ba(num_cameras=cams, num_points=pts, visibility=0.4,
                        batch=1, dtype=jnp.float32)
    obj, _, _ = build_ba_objective(prob, dtype=jnp.float32)
    opt = tt.LevenbergMarquardt(obj, max_iterations=10,
                                adaptive_damping=True,
                                ellipsoidal_damping=True,
                                linearization="schur")
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(ba_values(prob))
    return layer, co.pack(values, 1), co.build_aux(values, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*", default=["64x16"])
    p.add_argument("--ba", nargs="*", default=[])
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--base", type=int, default=4)
    p.add_argument("--extra", type=int, default=28)
    args = p.parse_args()

    jobs = [("pgo", s) for s in args.shapes] + [("ba", s) for s in args.ba]
    for kind, shape in jobs:
        n, b = (int(x) for x in shape.split("x"))
        arms = {}
        for name, fold in (("fold", True), ("pad", False)):
            config.set_pallas_lane_fold(fold)
            layer, state, aux = (build_pgo(n, b) if kind == "pgo"
                                 else build_ba(n, b))
            t0 = time.perf_counter()
            arms[name] = (compiled_pair(layer, state, aux,
                                        args.base, args.extra), state, aux)
            print(f"[{kind} {shape} {name}] compiled in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
        config.set_pallas_lane_fold(True)

        results = {k: [] for k in arms}
        order = list(arms)
        for rnd in range(args.rounds):
            for k in (order if rnd % 2 == 0 else order[::-1]):
                (c_a, c_b), state, aux = arms[k]
                ts = {}
                for tag, c in (("a", c_a), ("b", c_b)):
                    best = float("inf")
                    for i in range(3):
                        eps = jnp.float32(fresh_eps(rnd * 10 + i))
                        t0 = time.perf_counter()
                        np.asarray(c(state, aux, eps))
                        best = min(best, time.perf_counter() - t0)
                    ts[tag] = best
                results[k].append((ts["b"] - ts["a"]) / args.extra * 1e3)

        print(f"\n{kind} {shape} per-arm medians (ms/LM-iter, interleaved):")
        for k, v in results.items():
            print(f"  {k:5s} {np.median(v):.3f}  (rounds: "
                  + ", ".join(f"{x:.3f}" for x in v) + ")", flush=True)


if __name__ == "__main__":
    main()
