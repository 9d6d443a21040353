"""Per-component timing of the flagship sparse LM iteration: linearize,
assemble, factorize, triangular solve, retract — each timed by the marginal
method (a jitted fori_loop of N chained applications; (t(N2)-t(N1))/(N2-N1))
so the remote-tunnel dispatch latency cancels out.

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

from theseus_tpu.utils import fresh_eps

import bench


def _dep(y):
    """A numerically-negligible scalar that data-depends on EVERY leaf of y.
    NOT a literal zero: XLA's algebraic simplifier folds mul-by-0 and would
    dead-code the loop body; and summing only one leaf would leave the other
    outputs dead. 1e-30 * sum underflows to ~0 in f32 arithmetic but keeps
    all dependency edges alive."""
    leaves = jax.tree_util.tree_leaves(y)
    if not leaves:
        return 0.0
    s = sum(jnp.sum(l) for l in leaves)
    return s * 1e-30


def chained_ms(f, x, n1=8, n2=520, reps=5):
    """ms per application of f, via chained fori_loop marginal timing.
    f: pytree -> pytree. The loop feeds a zero-valued dependency on each
    output back into the input so XLA executes every iteration. Every timed
    call gets a DIFFERENT eps-perturbed input: the remote executor caches
    results of bit-identical calls, which silently zeroes marginals."""

    def loop(x, n, eps):
        x = jax.tree_util.tree_map(lambda t: t * (1.0 + eps).astype(t.dtype), x)

        def body(i, x):
            y = f(x)
            d = _dep(y).astype(jax.tree_util.tree_leaves(x)[0].dtype)
            return jax.tree_util.tree_map(lambda t: t + d.astype(t.dtype), x)
        return jax.lax.fori_loop(0, n, body, x)

    g1 = jax.jit(lambda x, eps: loop(x, n1, eps))
    g2 = jax.jit(lambda x, eps: loop(x, n2, eps))
    z = jnp.float32(0.0)
    jax.tree_util.tree_map(np.asarray, g1(x, z))
    jax.tree_util.tree_map(np.asarray, g2(x, z))

    def t(g):
        ts = []
        for i in range(reps):
            eps = jnp.float32(fresh_eps(i))
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, g(x, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(g2) - t(g1)) / (n2 - n1) * 1e3


def main(n_poses, batch):
    from theseus_tpu.optim.normal import SparseNormalBuilder
    from theseus_tpu.sparse.assemble import apply_block_damping, assemble
    from theseus_tpu.sparse.cholesky import factorize, solve_with_factor

    layer, state, aux = bench.build(n_poses=n_poses, batch=batch,
                                    linearization="sparse")
    opt = layer.optimizer
    co = opt.objective.compile()
    bld = SparseNormalBuilder(co)

    blocks = jax.jit(lambda s, a: co.linearize_blocks(s, a))(state, aux)
    ata, atb = jax.jit(lambda b: assemble(bld.pattern, co, b))(blocks)
    ata_d = jax.jit(lambda a: apply_block_damping(
        bld.pattern, a, 1e-3, True, bld.damping_eps))(ata)
    lflat = jax.jit(lambda a: factorize(bld.sched, a))(ata_d)

    rows = [
        ("linearize_blocks", chained_ms(
            lambda x: co.linearize_blocks(x[0], x[1]), (state, aux))),
        ("assemble AtA/Atb", chained_ms(
            lambda b: assemble(bld.pattern, co, b), blocks)),
        ("block damping", chained_ms(
            lambda a: apply_block_damping(bld.pattern, a, 1e-3, True,
                                          bld.damping_eps), ata)),
        ("factorize (chol)", chained_ms(
            lambda a: factorize(bld.sched, a), ata_d)),
        ("triangular solve", chained_ms(
            lambda x: solve_with_factor(bld.sched, x[0], x[1]),
            (lflat, atb))),
    ]

    from theseus_tpu.lie import se3

    delta = jax.jit(
        lambda l, b: bld.flatten(solve_with_factor(bld.sched, l, b)))(lflat, atb)

    def retract_all(x):
        s, d = x
        poses = s["SE3"]  # (N, B, 3, 4)
        n = poses.shape[0]
        dd = jnp.moveaxis(d.reshape(d.shape[0], n, 6), 0, 1)
        return se3.compose(poses, se3.exp(dd))

    rows.append(("retract (exp+cmp)", chained_ms(retract_all, (state, delta))))
    rows.append(("error metric", chained_ms(
        lambda x: co.error_metric(x[0], x[1]), (state, aux))))

    for name, ms in rows:
        print(f"{name:18s}: {ms:9.3f} ms")

    # whole-iteration reference
    opts = opt.opts

    def make(n):
        from theseus_tpu.utils.hoist import hoist_jit

        @hoist_jit
        def fwd(state, aux, eps):
            state = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = opt.init_carry(state, aux, opts)
            carry = opt.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    f2, f10, f26 = make(2), make(34), make(98)
    for f in (f2, f10, f26):
        np.asarray(f(state, aux, jnp.float32(0.0)))

    def t(f):
        ts = []
        for i in range(5):
            eps = jnp.float32(fresh_eps(i))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t2, t10, t26 = t(f2), t(f10), t(f26)
    print(f"{'full LM iter':18s}: {(t10 - t2) / 32:9.3f} ms "
          f"({(t26 - t10) / 64:9.3f} ms over 34->98)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-poses", type=int, default=256)
    p.add_argument("--batch", type=int, default=128)
    a = p.parse_args()
    main(a.n_poses, a.batch)
