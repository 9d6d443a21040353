"""Interleaved A/B: mixed-dof Schur (cam dof 6 / point dof 3 slices) vs the
pre-slice uniform-pad path (pt_d = cam_d = d) on the SAME BA problem.

VERDICT r4 #2 asked for the full mixed-dof change to be A/B'd cache-proof
before curating: the chip's effective throughput drifts ~±20% with recent
activity, so sequential runs (180.2 ms pt-slice in r4 vs 188.0 ms full
mixed-dof in r5) cannot be compared directly — only INTERLEAVED windows
with per-arm medians can (scripts/ab_bookkeeping.py precedent).

    python scripts/ab_schur_dof.py [--size 128x4000] [--rounds 3]

Numeric equivalence of the two paths is pinned separately by
tests/optim/test_schur.py::test_schur_mixed_dof_slice_equivalence.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils import fresh_eps
from theseus_tpu.utils.hoist import hoist_jit


def build(cameras, points):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, synthetic_ba)

    prob = synthetic_ba(num_cameras=cameras, num_points=points,
                        visibility=0.4, batch=1, dtype=jnp.float32)
    obj, _, _ = build_ba_objective(prob, dtype=jnp.float32)
    opt = tt.LevenbergMarquardt(obj, max_iterations=10, adaptive_damping=True,
                                ellipsoidal_damping=True,
                                linearization="schur")
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(ba_values(prob))
    state = co.pack(values, 1)
    aux = co.build_aux(values, 1)
    return layer, state, aux


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="128x4000")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--base", type=int, default=4)
    p.add_argument("--extra", type=int, default=28)
    args = p.parse_args()
    cams, pts = (int(x) for x in args.size.split("x"))

    arms = {}
    for name, uniform in (("mixed", False), ("uniform", True)):
        layer, state, aux = build(cams, pts)
        bld = layer.optimizer.normal_builder
        if uniform:
            # force the pre-slice uniform-pad path (same trick as the
            # equivalence test): both axes padded to the block pattern's d
            bld.pt_d = bld.pattern.d
            bld.cam_d = bld.pattern.d
        print(f"[{name}] pt_d={bld.pt_d} cam_d={bld.cam_d} "
              f"(pattern d={bld.pattern.d}); compiling...", flush=True)
        t0 = time.perf_counter()
        arms[name] = (compiled_pair(layer, state, aux, args.base, args.extra),
                      state, aux)
        print(f"[{name}] compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)

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
            ms = (ts["b"] - ts["a"]) / args.extra * 1e3
            results[k].append(ms)
            print(f"round {rnd} {k}: {ms:.1f} ms/iter", flush=True)

    print("\nper-arm medians (ms/LM-iter, interleaved):")
    for k, v in results.items():
        print(f"  {k:8s} {np.median(v):.1f}  (rounds: "
              + ", ".join(f"{x:.1f}" for x in v) + ")")


if __name__ == "__main__":
    main()
