"""Vectorization ablation: per-LM-iteration time with schema-bucketed
vectorization on/off and Pallas fused kernels on/off.

Analog of the reference's paper Fig. 3 reproduction
(/root/reference/evaluations/vectorization_ablation.sh:1-16, which toggles
inner_optim.vectorize over pose counts): here the axes are
compile(vectorize=...) — one bucket per cost vs schema buckets — and
config.set_use_pallas. Run on the TPU:

    python evaluations/vectorization_ablation.py [--sizes 16,64,256]

Writes evaluations/results_vectorization.md.
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

OUT = pathlib.Path(__file__).resolve().parent / "results_vectorization.md"


def build(n_poses, batch, vectorize, dtype=jnp.float32):
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective, pose_values, synthetic_pose_graph)

    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=dtype)
    obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0], dtype=dtype)
    opt = tt.LevenbergMarquardt(obj, max_iterations=10, adaptive_damping=True,
                                linearization="sparse")
    layer = tt.TheseusLayer(opt)
    co = obj.compile(vectorize=vectorize)
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    return layer, state, aux


def per_iter_ms(layer, state, aux, base=2, extra=32):
    """32-iteration window + fresh_eps: this script previously timed three
    BIT-IDENTICAL calls per arm, so the remote executor's result cache could
    serve reps 2-3 instantly and the min was garbage — any pre-r4 numbers in
    results_vectorization.md are suspect and were re-measured."""
    opts = layer.optimizer.opts

    def make(n):
        @jax.jit
        def fwd(state, aux, eps):
            st = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(st, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    f_a, f_b = make(base), make(base + extra)
    z = jnp.float32(0)
    np.asarray(f_a(state, aux, z)); np.asarray(f_b(state, aux, z))

    def t(f, off):
        ts = []
        for i in range(3):
            eps = jnp.float32(fresh_eps(i + off))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(f_b, 0) - t(f_a, 3)) / extra * 1e3


ALL_COMBOS = {"off": (False, False), "on": (True, False), "on+pallas": (True, "auto")}


def main(sizes, batch, combos=None):
    from theseus_tpu import config

    combos = [ALL_COMBOS[c] for c in (combos or list(ALL_COMBOS))]
    rows = []
    for n_poses in sizes:
        for vec, pallas in combos:
            config.set_use_pallas(pallas)
            try:
                t0 = time.time()
                layer, state, aux = build(n_poses, batch, vectorize=vec)
                ms = per_iter_ms(layer, state, aux)
                compile_s = time.time() - t0
            except Exception as e:  # huge unvectorized traces can blow up
                # record the failure class, not nan: a nan cell can't be told
                # apart from "not yet measured" (ADVICE r3)
                print(f"poses={n_poses} vec={vec} pallas={pallas}: FAILED {e}")
                rows.append((n_poses, vec, pallas, f"failed ({type(e).__name__})", "-"))
                continue
            finally:
                config.set_use_pallas("auto")
            rows.append((n_poses, vec, pallas, f"{ms:.2f}", f"{compile_s:.0f}"))
            print(f"poses={n_poses:4d} vectorize={vec!s:5s} pallas={pallas!s:5s}: "
                  f"{ms:8.2f} ms/iter (compile {compile_s:.0f}s)", flush=True)
            _write(rows, batch)  # incremental: a killed run keeps its cells

    _write(rows, batch)


def _write(rows, batch):
    # merge with any existing table so partial extensions (e.g. a 512-pose
    # run hours after the 16/64 one) don't clobber prior rows
    merged = {}
    if OUT.exists():
        for line in OUT.read_text().splitlines():
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) == 5 and cells[0].isdigit():
                merged[(int(cells[0]), cells[1], cells[2])] = (cells[3], cells[4])
    for n, v, p, ms, cs in rows:
        merged[(n, str(v), str(p))] = (ms, cs)
    with open(OUT, "w") as f:
        f.write("# Vectorization ablation (PGO SE3, batch %d)\n\n" % batch)
        f.write("Caveat (r4): rows measured before 2026-08-19 used bit-identical\n")
        f.write("timed calls, which the remote executor can serve from its result\n")
        f.write("cache — treat pre-r4 ms values as lower bounds; the qualitative\n")
        f.write("vectorized-vs-unvectorized gap (10-100x in both ms and compile\n")
        f.write("time) is unaffected. Rows (re)measured by the current script use\n")
        f.write("fresh_eps + 32-iteration windows.\n\n")
        f.write("| poses | vectorize | pallas | ms/LM-iter | compile (s) |\n")
        f.write("|---|---|---|---|---|\n")
        for (n, v, p), (ms, cs) in sorted(merged.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2])):
            f.write(f"| {n} | {v} | {p} | {ms} | {cs} |\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="16,64")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--combos", default=None,
                   help="comma list of off,on,on+pallas (default all); lets "
                        "the cheap vectorized rows land without waiting for "
                        "the unvectorized compile at large sizes")
    a = p.parse_args()
    main([int(s) for s in a.sizes.split(",")], a.batch,
         a.combos.split(",") if a.combos else None)
