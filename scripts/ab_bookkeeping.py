"""A/B the LM iteration's bookkeeping at the flagship shape (VERDICT r3 #3:
name where the non-phase 1.1 ms of the 2.63 ms iteration goes).

Arms (each a whole-iteration marginal over a 32-iteration window,
cache-proof inputs):
  adaptive   - full adaptive LM (gain ratio: diag gather + Atb dot + masks)
  fixed      - LM with adaptive_damping=False (drops gain-ratio bookkeeping)
  gn         - GaussNewton (drops damping entirely)
  no-history - adaptive LM with track_err_history=False (drops the per-iter
               history scatter)

Run on the TPU:  python scripts/ab_bookkeeping.py [--n-poses 256 --batch 128]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils import fresh_eps

import bench


def measure(layer, state, aux, opts, base=2, extra=32, reps=3):
    def make(n):
        @jax.jit
        def fwd(state, aux, eps):
            st = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(st, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    fa, fb = make(base), make(base + extra)
    np.asarray(fa(state, aux, jnp.float32(0)))
    np.asarray(fb(state, aux, jnp.float32(0)))

    def t(f, off):
        ts = []
        for i in range(reps):
            eps = jnp.float32(fresh_eps(i + off))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(fb, 0) - t(fa, reps)) / extra * 1e3


def main(n_poses, batch):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import (build_pgo_objective,
                                                       pose_values,
                                                       synthetic_pose_graph)

    gt, edges, meas, init = synthetic_pose_graph(n_poses=n_poses, batch=batch,
                                                 seed=0)
    values_in = pose_values(init)

    def build(opt_cls, **kw):
        obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0])
        opt = opt_cls(obj, max_iterations=10, linearization="sparse", **kw)
        layer = tt.TheseusLayer(opt)
        co = obj.compile()
        values = obj.default_values(values_in)
        state = co.pack(values, batch)
        aux = co.build_aux(values, batch)
        return layer, state, aux

    layer, state, aux = build(tt.LevenbergMarquardt, adaptive_damping=True)
    arms = [
        ("adaptive LM", layer, layer.optimizer.opts),
        ("no-history", layer,
         dataclasses.replace(layer.optimizer.opts, track_err_history=False)),
    ]
    layer2, state2, aux2 = build(tt.LevenbergMarquardt, adaptive_damping=False)
    arms.append(("fixed-damping LM", layer2, layer2.optimizer.opts))
    layer3, state3, aux3 = build(tt.GaussNewton)
    arms.append(("GaussNewton", layer3, layer3.optimizer.opts))

    states = {"adaptive LM": (layer, state, aux),
              "no-history": (layer, state, aux),
              "fixed-damping LM": (layer2, state2, aux2),
              "GaussNewton": (layer3, state3, aux3)}
    # INTERLEAVED rounds: the chip's effective clock drifts with recent
    # activity (observed: identical programs reading 1.5 vs 2.6 ms/iter in
    # back-to-back blocks), so per-arm blocks confound arm and time; three
    # A/B/C/D rounds with per-arm medians de-confound it
    results = {name: [] for name, *_ in arms}
    for rnd in range(3):
        for name, ly, opts in arms:
            ly, st, ax = states[name]
            ms = measure(ly, st, ax, opts)
            results[name].append(ms)
            print(f"round {rnd} {name:18s}: {ms:7.3f} ms/iter", flush=True)
    print("--- medians ---")
    for name, *_ in arms:
        vals = sorted(results[name])
        print(f"{name:18s}: {vals[len(vals)//2]:7.3f} ms/iter  (runs: "
              f"{', '.join(f'{v:.3f}' for v in vals)})", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=256)
    p.add_argument("--batch", type=int, default=128)
    a = p.parse_args()
    main(a.n_poses, a.batch)
