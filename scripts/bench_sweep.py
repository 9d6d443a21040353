"""Benchmark sweep across problem sizes/backends (prints a table; appends a
raw section to BENCH_SWEEP_RAW.md — BENCH_SWEEP.md itself is the curated
document and is edited by hand).

Per-LM-iteration device time via the marginal method (t(n+k) - t(n))/k to
strip the remote-tunnel round trip, with eps-perturbed inputs per timed call
(the remote executor serves bit-identical repeats from a result cache).

Run on the TPU:  python scripts/bench_sweep.py [--configs 64x16:sparse,...]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils import fresh_eps

import bench


def per_iter_ms(layer, state, aux, base=2, extra=32, reps=3):
    """Marginal window 2->34: the tunnel's ~100 ms per-call constant
    jitters by +-4 ms, so an 8-iteration window carries +-0.5-1 ms/iter of
    endpoint noise (observed: flagship readings scattered 1.6-3.0 ms/iter);
    32 iterations amortize it to <0.15 ms/iter."""
    opts = layer.optimizer.opts

    def make(n):
        from theseus_tpu.utils.hoist import hoist_jit

        @hoist_jit
        def fwd(state, aux, eps):
            state = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(state, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]

        return fwd

    f_a, f_b = make(base), make(base + extra)
    t0 = time.perf_counter()
    np.asarray(f_a(state, aux, jnp.float32(0)))
    first_call_s = time.perf_counter() - t0  # trace + compile + first run
    np.asarray(f_b(state, aux, jnp.float32(0)))

    def t(f, off):
        ts = []
        for i in range(reps):
            eps = jnp.float32(fresh_eps(i + off))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(f_b, 0) - t(f_a, reps)) / extra * 1e3, first_call_s


DEFAULT = "64x16:dense,64x16:sparse,256x128:sparse,512x32:sparse"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default=DEFAULT,
                   help="comma list of NxB:backend (e.g. 2048x8:sparse)")
    args = p.parse_args()
    configs = []
    for spec in args.configs.split(","):
        shape, lin = spec.split(":")
        n, b = (int(x) for x in shape.split("x"))
        configs.append((n, b, lin))

    rows = []
    for n_poses, batch, lin in configs:
        t0 = time.time()
        layer, state, aux = bench.build(
            n_poses=n_poses, batch=batch, linearization=lin
        )
        ms, first_call_s = per_iter_ms(layer, state, aux)
        rows.append((n_poses, batch, lin, ms, first_call_s, time.time() - t0))
        print(f"poses={n_poses:5d} batch={batch:4d} {lin:6s}: "
              f"{ms:7.2f} ms/iter  first-call {first_call_s:.1f}s "
              f"(total incl. build {rows[-1][5]:.0f}s)",
              flush=True)

    stamp = time.strftime("%Y-%m-%d %H:%M")
    out = [f"\n## raw sweep {stamp} (platform={jax.default_backend()})\n",
           "| poses | batch | backend | ms / LM-iteration | first-call compile (s) | total incl. build (s) |",
           "|---|---|---|---|---|---|"]
    for n_poses, batch, lin, ms, fc, tot in rows:
        out.append(f"| {n_poses} | {batch} | {lin} | {ms:.2f} | {fc:.1f} | {tot:.0f} |")
    with open("BENCH_SWEEP_RAW.md", "a") as f:
        f.write("\n".join(out) + "\n")
    print("appended to BENCH_SWEEP_RAW.md (curate into BENCH_SWEEP.md)")


if __name__ == "__main__":
    main()
