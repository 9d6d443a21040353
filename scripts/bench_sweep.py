"""Benchmark sweep across problem sizes/backends; writes BENCH_SWEEP.md.

Per-LM-iteration device time via the marginal method (t(n+k) - t(n))/k to
strip the remote-tunnel round trip. Run on the TPU:  python scripts/bench_sweep.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

import bench


def per_iter_ms(layer, state, aux, base=2, extra=8):
    opts = layer.optimizer.opts

    def make(n):
        @jax.jit
        def fwd(state, aux):
            carry = layer.optimizer.init_carry(state, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]

        return fwd

    f_a, f_b = make(base), make(base + extra)
    np.asarray(f_a(state, aux))
    np.asarray(f_b(state, aux))

    def t(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(state, aux))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(f_b) - t(f_a)) / extra * 1e3


def main():
    rows = []
    configs = [
        (64, 16, "dense"),
        (64, 16, "sparse"),
        (256, 128, "sparse"),
        (512, 32, "sparse"),
    ]
    for n_poses, batch, lin in configs:
        t0 = time.time()
        layer, state, aux = bench.build(n_poses=n_poses, batch=batch, linearization=lin)
        ms = per_iter_ms(layer, state, aux)
        rows.append((n_poses, batch, lin, ms, time.time() - t0))
        print(f"poses={n_poses:5d} batch={batch:4d} {lin:6s}: "
              f"{ms:7.2f} ms/iter  (total incl. compile {rows[-1][4]:.0f}s)",
              flush=True)

    out = ["# Benchmark sweep — SE3 PGO, LM, TPU v5e (single chip)\n",
           "| poses | batch | backend | ms / LM-iteration |",
           "|---|---|---|---|"]
    for n_poses, batch, lin, ms, _ in rows:
        out.append(f"| {n_poses} | {batch} | {lin} | {ms:.2f} |")
    out.append("\nReference (torch CPU, same machine): 60.88 ms/iter at 64/16 dense.")
    pathlib.Path("BENCH_SWEEP.md").write_text("\n".join(out) + "\n")
    print("wrote BENCH_SWEEP.md")


if __name__ == "__main__":
    main()
