"""Hardware A/B for level-RUN scanning (config.LEVEL_RUNS): per-LM-iteration
ms AND first-call compile seconds with runs forced on vs off, cache-proof
timing (see scripts/ab_flagship.py for the methodology).

Run on the TPU:  python scripts/ab_level_runs.py [--shapes 256x128,2048x8,2500x1]

Interpretation: runs shrink the traced program O(#levels) -> O(#runs); the
question the chip must answer is whether the scan + padded-run Mosaic
kernels cost runtime vs the unrolled per-level plan. If ms is neutral at
256x128 (13 levels), lower config.LEVEL_RUN_MIN_LEVELS to 12.
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
from theseus_tpu import config as tt_config

# cold-compile fairness: the package enables a persistent compilation cache,
# so whichever variant was compiled by an earlier session/stage would report
# a warm "first call" while the other pays the real compile — disable it for
# the A/B (both sides cold within this process)
jax.config.update("jax_compilation_cache_dir", None)


def measure(n_poses, batch, runs_mode, reps=3, base=4, extra=24, seed=0):
    tt_config.set_level_runs(runs_mode)
    try:
        t_build0 = time.time()
        layer, state, aux = bench.build(n_poses=n_poses, batch=batch,
                                        seed=seed)
        opts = layer.optimizer.opts

        def make(n):
            @jax.jit
            def fwd(state, aux, eps):
                state = {k: v * (1.0 + eps) for k, v in state.items()}
                carry = layer.optimizer.init_carry(state, aux, opts)
                carry = layer.optimizer.run_scan(carry, aux, n, opts)
                return carry["err"]
            return fwd

        fa, fb = make(base), make(base + extra)
        t0 = time.time()
        np.asarray(fa(state, aux, jnp.float32(0)))
        compile_s = time.time() - t0  # first-call trace+compile (base prog)
        np.asarray(fb(state, aux, jnp.float32(0)))

        def t(f, off):
            ts = []
            for i in range(reps):
                eps = jnp.float32(fresh_eps(i + off))
                tt = time.perf_counter()
                np.asarray(f(state, aux, eps))
                ts.append(time.perf_counter() - tt)
            return min(ts)

        ms = (t(fb, 0) - t(fa, reps)) / extra * 1e3
        return ms, compile_s, time.time() - t_build0
    finally:
        tt_config.set_level_runs("auto")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="256x128,2048x8,2500x1")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    for spec in args.shapes.split(","):
        n, b = (int(x) for x in spec.split("x"))
        for mode, tag in ((False, "unrolled"), (True, "runs")):
            ms, comp, total = measure(n, b, mode, reps=args.reps)
            print(
                f"poses={n} batch={b} {tag:9s}: {ms:7.3f} ms/LM-iter  "
                f"first-call {comp:6.1f}s  (build+bench {total:.0f}s)",
                flush=True,
            )
