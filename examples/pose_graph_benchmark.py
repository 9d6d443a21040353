"""g2o pose-graph timing harness (reference examples/pose_graph/
pose_graph_benchmark.py:35): load a 3D g2o file (e.g. sphere2500), run LM
with the sparse block Cholesky, report per-iteration time and final chi2.
Without a file, generates a synthetic problem of the requested size."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import _config as _cfgmod

_parser = argparse.ArgumentParser()
_parser.add_argument("--g2o", default=None)
_parser.add_argument("--n-poses", type=int, default=256)
_parser.add_argument("--iters", type=int, default=10)
_parser.add_argument("--f32", action="store_true",
                     help="float32 (the TPU-native dtype; default is f64)")
_ARGS = _cfgmod.parse_with_config(_parser)

import jax

if not _ARGS.f32:
    jax.config.update("jax_enable_x64", True)

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.utils.examples.pose_graph import (
    build_pgo_objective,
    pose_values,
    read_3d_g2o,
    synthetic_pose_graph,
)


def main(g2o_path=None, n_poses=256, iters=10, dtype=jnp.float64):
    if g2o_path:
        n, poses, edges, meas, w = read_3d_g2o(g2o_path, dtype)
        obj, pose_vars = build_pgo_objective(n, edges, meas, poses[0], dtype=dtype)
        init = {f"pose_{i}": poses[i] for i in range(n)}
        batch = 1
    else:
        gt, edges, meas, init_poses = synthetic_pose_graph(
            n_poses=n_poses, batch=1, dtype=dtype
        )
        obj, pose_vars = build_pgo_objective(n_poses, edges, meas, gt[0], dtype=dtype)
        init = pose_values(init_poses)
        n, batch = n_poses, 1

    opt = tt.LevenbergMarquardt(
        obj, max_iterations=iters, adaptive_damping=True, linearization="sparse"
    )
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(init)
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)

    @jax.jit
    def solve(state, aux):
        carry = opt.init_carry(state, aux, opt.opts)
        carry = opt.run_scan(carry, aux, iters, opt.opts)
        return carry["err"], carry["history"]

    t0 = time.perf_counter()
    err, hist = solve(state, aux)
    np.asarray(err)
    compile_and_run = time.perf_counter() - t0
    # re-time with a perturbed input (remote executors may cache identical
    # calls); the raw-tensor scale slightly denormalizes the rotation blocks,
    # so the reported chi2 comes from this (negligibly) perturbed input —
    # the perturbation exists only to defeat result caching
    state2 = {k: v * (1.0 + jnp.asarray(1e-7, v.dtype)) for k, v in state.items()}
    t0 = time.perf_counter()
    err, hist = solve(state2, aux)
    np.asarray(err)
    run = time.perf_counter() - t0
    print(f"n_poses={n} edges={len(obj.cost_functions)-1} iters={iters}")
    print(f"first call (incl. compile): {compile_and_run:.2f}s; steady: {run*1e3:.1f} ms "
          f"({run/iters*1e3:.2f} ms/iter)")
    print("chi2 history:", np.asarray(hist)[:, 0])


if __name__ == "__main__":
    a = _ARGS
    main(a.g2o, a.n_poses, a.iters,
         dtype=jnp.float32 if a.f32 else jnp.float64)
