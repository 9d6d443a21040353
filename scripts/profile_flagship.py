"""Per-component timing of the flagship sparse LM iteration: linearize,
assemble, factorize, triangular solve, retract — each jitted and timed
separately to locate the next optimization target.

Run on the TPU:  python scripts/profile_flagship.py [--n-poses 256 --batch 128]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # sync via host transfer
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main(n_poses, batch):
    from theseus_tpu.optim.normal import SparseNormalBuilder
    from theseus_tpu.sparse.assemble import apply_block_damping, assemble
    from theseus_tpu.sparse.cholesky import factorize, solve_with_factor

    layer, state, aux = bench.build(n_poses=n_poses, batch=batch,
                                    linearization="sparse")
    opt = layer.optimizer
    co = opt.objective.compile()
    bld = SparseNormalBuilder(co)

    lin = jax.jit(lambda s, a: co.linearize_blocks(s, a))
    blocks = lin(state, aux)
    print(f"linearize_blocks : {timeit(lin, state, aux):9.3f} ms")

    asm = jax.jit(lambda b: assemble(bld.pattern, co, b))
    ata, atb = asm(blocks)
    print(f"assemble AtA/Atb : {timeit(asm, blocks):9.3f} ms")

    damp = jax.jit(lambda a: apply_block_damping(bld.pattern, a, 1e-3, True,
                                                 bld.damping_eps))
    ata_d = damp(ata)
    print(f"block damping    : {timeit(damp, ata):9.3f} ms")

    fac = jax.jit(lambda a: factorize(bld.sched, a))
    lflat = fac(ata_d)
    print(f"factorize (chol) : {timeit(fac, ata_d):9.3f} ms")

    sol = jax.jit(lambda l, b: solve_with_factor(bld.sched, l, b))
    _ = sol(lflat, atb)
    print(f"triangular solve : {timeit(sol, lflat, atb):9.3f} ms")

    from theseus_tpu.lie import se3

    delta = jax.jit(lambda l, b: bld.flatten(solve_with_factor(bld.sched, l, b)))(
        lflat, atb)

    def retract_all(s, d):
        poses = s["SE3"]  # (N, B, 3, 4)
        n = poses.shape[0]
        dd = jnp.moveaxis(d.reshape(d.shape[0], n, 6), 0, 1)
        return se3.compose(poses, se3.exp(dd))

    ret = jax.jit(retract_all)
    _ = ret(state, delta)
    print(f"retract (exp+cmp): {timeit(ret, state, delta):9.3f} ms")

    err = jax.jit(lambda s, a: co.error_metric(s, a))
    _ = err(state, aux)
    print(f"error metric     : {timeit(err, state, aux):9.3f} ms")

    # whole-iteration reference
    opts = opt.opts

    def make(n):
        @jax.jit
        def fwd(state, aux):
            carry = opt.init_carry(state, aux, opts)
            carry = opt.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    f2, f10 = make(2), make(10)
    np.asarray(f2(state, aux)); np.asarray(f10(state, aux))
    t2 = timeit(f2, state, aux, reps=3)
    t10 = timeit(f10, state, aux, reps=3)
    print(f"full LM iter     : {(t10 - t2) / 8:9.3f} ms (marginal)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=256)
    p.add_argument("--batch", type=int, default=128)
    a = p.parse_args()
    main(a.n_poses, a.batch)
