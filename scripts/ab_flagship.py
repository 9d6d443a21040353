"""Whole-iteration A/B harness: per-LM-iteration ms at a given shape, with
cache-proof (eps-perturbed) timing. The ONLY trustworthy way to evaluate a
perf change on the remote TPU is this whole-iteration marginal; isolated
component chains overestimate and unperturbed repeats hit the result cache.

Usage:  python scripts/ab_flagship.py [--n-poses 256 --batch 128 --reps 4]
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


def per_iter_ms(n_poses, batch, reps=4, base=10, extra=100, seed=0):
    layer, state, aux = bench.build(n_poses=n_poses, batch=batch, seed=seed)
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
    err_a = np.asarray(fa(state, aux, jnp.float32(0)))
    np.asarray(fb(state, aux, jnp.float32(0)))

    def t(f, off):
        ts = []
        for i in range(reps):
            eps = jnp.float32(fresh_eps(i + off))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(fb, 0) - t(fa, reps)) / extra * 1e3
    return ms, float(np.mean(err_a))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=256)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()
    ms, err = per_iter_ms(args.n_poses, args.batch, reps=args.reps)
    print(f"poses={args.n_poses} batch={args.batch}: {ms:.3f} ms/LM-iter  "
          f"(mean final err {err:.6e})")
