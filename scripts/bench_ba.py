"""Bundle-adjustment benchmark: per-LM-iteration time across BA sizes and
normal-equation backends (schur / sparse / dense), BAL-format files
supported.

The BASELINE.md north star names BA alongside PGO; this records the BA half.
Run on the TPU:

    python scripts/bench_ba.py [--sizes 16x200,64x800] [--bal path.txt]

Appends a table to BENCH_SWEEP.md.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

OUT = pathlib.Path(__file__).resolve().parents[1] / "BENCH_SWEEP.md"


def build(cameras, points, backend, batch=1, bal_path=None, dtype=jnp.float32):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, load_bal, synthetic_ba)

    if bal_path:
        prob = load_bal(bal_path, dtype=dtype)
    else:
        prob = synthetic_ba(num_cameras=cameras, num_points=points,
                            visibility=0.4, batch=batch, dtype=dtype)
    obj, _, _ = build_ba_objective(prob, dtype=dtype)
    # ellipsoidal (diag-relative) damping: additive damping at f32 BA scale
    # (focal ~1e3 => AtA entries ~1e8) makes the first steps singular
    opt = tt.LevenbergMarquardt(obj, max_iterations=10, adaptive_damping=True,
                                ellipsoidal_damping=True,
                                linearization=backend)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(ba_values(prob))
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    return layer, state, aux, prob


def per_iter_ms(layer, state, aux, base=4, extra=24):
    opts = layer.optimizer.opts

    def make(n):
        @jax.jit
        def fwd(state, aux, eps):
            # cache-proof: the remote executor serves bit-identical repeated
            # executions from a result cache; perturb the input per rep
            state = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(state, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    f_a, f_b = make(base), make(base + extra)
    z = jnp.float32(0)
    np.asarray(f_a(state, aux, z)); np.asarray(f_b(state, aux, z))

    def t(f):
        ts = []
        for i in range(3):
            eps = jnp.float32(1e-7 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(f_b) - t(f_a)) / extra * 1e3


def main(sizes, backends, bal_path):
    rows = []
    if bal_path:
        sizes = [(0, 0)]
    for cams, pts in sizes:
        for backend in backends:
            t0 = time.time()
            try:
                layer, state, aux, prob = build(cams, pts, backend,
                                                bal_path=bal_path)
                ms = per_iter_ms(layer, state, aux)
            except Exception as e:
                print(f"cams={cams} pts={pts} {backend}: FAILED {e}")
                continue
            nobs = len(prob.obs_cam)
            rows.append((prob.num_cameras, prob.num_points, nobs, backend, ms))
            print(f"cams={prob.num_cameras:4d} pts={prob.num_points:6d} "
                  f"obs={nobs:6d} {backend:6s}: {ms:8.2f} ms/iter "
                  f"(total {time.time()-t0:.0f}s)", flush=True)

    with open(OUT, "a") as f:
        f.write("\n## Bundle adjustment (LM, single chip)\n\n")
        f.write("| cameras | points | observations | backend | ms/LM-iter |\n")
        f.write("|---|---|---|---|---|\n")
        for c, p, o, b, ms in rows:
            f.write(f"| {c} | {p} | {o} | {b} | {ms:.2f} |\n")
    print(f"appended to {OUT}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="16x200,64x800")
    p.add_argument("--backends", default="schur,sparse")
    p.add_argument("--bal", default=None)
    a = p.parse_args()
    sizes = [tuple(int(v) for v in s.split("x")) for s in a.sizes.split(",")]
    main(sizes, a.backends.split(","), a.bal)
