"""Decompose first-call latency at the sphere2500 PGO scale (2500 poses,
batch 1) into its phases, with the persistent compile cache pointed at a
fresh temp dir so the compile numbers are genuinely cold:

    build    objective construction + compile() + pack/build_aux (host)
    trace    hoist_jit's make_jaxpr pass + lowering to StableHLO
    compile  the .compile() call = the remote TPU compiler RPC
    exec1    first execution of the compiled program

Measured for the default plan (level sweeps unrolled) and for the
compile-latency knob the docs point at (config.set_level_runs(True):
solver program O(#runs) instead of O(#levels)), both through hoist_jit
(tables as runtime parameters, config.HOIST_CONSTANTS default).

This is the evidence for BENCH_SWEEP.md's compile-latency section: after
hoisting, trace+lower is seconds, and the dominant term is the remote
compiler RPC itself — a cost we can shrink only by shrinking the program
(level runs) or pre-warming the persistent cache (AOT path, already on by
default for repeat processes).

Run on the TPU:  python scripts/compile_decompose.py [--runs-only]
"""

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

# fresh cache dir BEFORE the package import enables the persistent cache
_tmp = tempfile.mkdtemp(prefix="theseus_cold_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _tmp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from theseus_tpu import config
from theseus_tpu.utils.hoist import hoist_jit

import bench


def decompose(n_poses, batch, iters=10):
    t0 = time.perf_counter()
    layer, state, aux = bench.build(n_poses=n_poses, batch=batch)
    t_build = time.perf_counter() - t0

    opts = layer.optimizer.opts

    @hoist_jit
    def fwd(state, aux, eps):
        st = {k: v * (1.0 + eps) for k, v in state.items()}
        carry = layer.optimizer.init_carry(st, aux, opts)
        carry = layer.optimizer.run_scan(carry, aux, iters, opts)
        return carry["err"]

    z = jnp.float32(0)
    t0 = time.perf_counter()
    lowered = fwd.lower(state, aux, z)
    hlo_mb = len(lowered.as_text()) / 1e6
    t_trace = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    np.asarray(compiled(state, aux, z))
    t_exec = time.perf_counter() - t0

    return dict(build=round(t_build, 1), trace=round(t_trace, 1),
                compile=round(t_compile, 1), exec1=round(t_exec, 1),
                hlo_mb=round(hlo_mb, 2),
                first_call=round(t_trace + t_compile + t_exec, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--poses", type=int, default=2500)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--runs-only", action="store_true")
    args = p.parse_args()

    arms = [("level_runs", True)] if args.runs_only else [
        ("unrolled", False), ("level_runs", True)]
    for name, runs in arms:
        config.set_level_runs(runs)
        r = decompose(args.poses, args.batch)
        print(json.dumps({"arm": name, "poses": args.poses,
                          "batch": args.batch, **r}), flush=True)


if __name__ == "__main__":
    main()
