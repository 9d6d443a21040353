"""Bundle-adjustment benchmark: per-LM-iteration time across BA sizes and
normal-equation backends (schur / sparse / dense), BAL-format files
supported.

The BASELINE.md north star names BA alongside PGO; this records the BA half.
Run on the TPU:

    python scripts/bench_ba.py [--sizes 16x200,64x800] [--bal path.txt]

Appends a raw table to BENCH_SWEEP_RAW.md (curate into BENCH_SWEEP.md).
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

# raw results append here; BENCH_SWEEP.md is curated by hand (same split as
# bench_sweep.py — raw bench runs must not edit the curated document)
OUT = pathlib.Path(__file__).resolve().parents[1] / "BENCH_SWEEP_RAW.md"


def build(cameras, points, backend, batch=1, bal_path=None, dtype=jnp.float32,
          schur_w="auto"):
    import theseus_tpu as tt
    from theseus_tpu import config as tt_config
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, load_bal, synthetic_ba)

    # dense-W vs sparse-W A/B knob: the Schur elimination densifies W/Hcp
    # onto the MXU only when it fits SCHUR_DENSE_BUDGET_BYTES; 0 forces the
    # chunked sparse-W segment-reduction path
    if schur_w == "sparse":
        tt_config.set_schur_dense_budget(0)
    elif schur_w == "dense":
        tt_config.set_schur_dense_budget(64 << 30)

    if bal_path:
        prob = load_bal(bal_path, batch=batch, dtype=dtype)
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


def per_iter_ms(layer, state, aux, base=4, extra=24, want_flops=False):
    """Marginal ms/iter; with want_flops also returns (flops/iter from the
    compiled executables' own XLA cost analysis, first-call compile s)."""
    opts = layer.optimizer.opts

    def make(n):
        from theseus_tpu.utils.hoist import hoist_jit

        @hoist_jit
        def fwd(state, aux, eps):
            # cache-proof: the remote executor serves bit-identical repeated
            # executions from a result cache; perturb the input per rep
            state = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.optimizer.init_carry(state, aux, opts)
            carry = layer.optimizer.run_scan(carry, aux, n, opts)
            return carry["err"]
        return fwd

    z = jnp.float32(0)
    # compile ONCE via lower()/compile() and reuse the executable for both
    # timing and cost analysis (calling .lower().compile() on a jit fn that
    # was also called normally would compile the 205k-cost program twice —
    # heavy enough to drop the remote-compile connection)
    t0 = time.perf_counter()
    c_a = make(base).lower(state, aux, z).compile()
    compile_s = time.perf_counter() - t0
    c_b = make(base + extra).lower(state, aux, z).compile()
    f_a = lambda s_, a_, e_: c_a(s_, a_, e_)
    f_b = lambda s_, a_, e_: c_b(s_, a_, e_)
    np.asarray(f_a(state, aux, z)); np.asarray(f_b(state, aux, z))
    flops_iter = None
    if want_flops:
        try:
            fl_a = c_a.cost_analysis().get("flops", 0.0)
            fl_b = c_b.cost_analysis().get("flops", 0.0)
            flops_iter = (fl_b - fl_a) / extra
            if not flops_iter or flops_iter != flops_iter:
                raise ValueError("empty cost analysis")
        except Exception:
            flops_iter = float("nan")

    def t(f):
        ts = []
        for i in range(3):
            eps = jnp.float32(fresh_eps(i))
            t0 = time.perf_counter()
            np.asarray(f(state, aux, eps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(f_b) - t(f_a)) / extra * 1e3
    if want_flops:
        return ms, flops_iter, compile_s
    return ms


PEAK_F32 = 49.2e12  # TPU v5e fp32-equivalent MXU peak


def profile_phases(layer, state, aux, backend):
    """Per-phase marginal ms at this shape (chained-loop method, see
    scripts/profile_flagship.py)."""
    import importlib
    pf = importlib.import_module("profile_flagship")
    co = layer.optimizer.objective.compile()
    nb = layer.optimizer.normal_builder

    blocks = jax.jit(lambda s, a: co.linearize_blocks(s, a))(state, aux)
    rows = [("linearize_blocks", pf.chained_ms(
        lambda x: co.linearize_blocks(x[0], x[1]), (state, aux)))]
    if backend == "schur":
        rows.append(("schur build+solve", pf.chained_ms(
            lambda x: nb.build(x[0], x[1]).solve(damping=1e-3)[0],
            (state, aux))))
    rows.append(("error metric", pf.chained_ms(
        lambda x: co.error_metric(x[0], x[1]), (state, aux))))
    return rows


def main(sizes, backends, bal_path, batch=1, schur_w="auto", profile=False):
    rows = []
    if bal_path:
        sizes = [(0, 0)]
    for cams, pts in sizes:
        for backend in backends:
            t0 = time.time()
            try:
                layer, state, aux, prob = build(cams, pts, backend,
                                                batch=batch,
                                                bal_path=bal_path,
                                                schur_w=schur_w)
                ms, flops, compile_s = per_iter_ms(layer, state, aux,
                                                   want_flops=True)
            except Exception as e:
                print(f"cams={cams} pts={pts} {backend}: FAILED {e}")
                continue
            nobs = len(prob.obs_cam)
            if not flops or flops != flops:
                # axon's cost_analysis is empty; analytic model for the
                # schur dense-W path: two (Cd x Pdp)(Pdp x Cd) GEMMs for
                # W Hpp^-1 W^T + the back-substitution pair, the S POTRF,
                # and per-obs linearization. Dims come from the ACTUAL block
                # pattern (earlier rounds hardcoded d=9; the real pad dof is
                # 6 and the point axis is dp=3 since the mixed-dof change,
                # so those MFU numbers were ~3.4x overstated).
                C, P = prob.num_cameras, prob.num_points
                B = batch
                try:
                    nb = layer.optimizer.normal_builder
                    Cd = C * nb.cam_d  # true camera dof (dc-sliced axis)
                    Pdp = P * nb.pt_d
                except AttributeError:
                    Cd, Pdp = C * 6, P * 3
                flops = (4 * B * Cd * Cd * Pdp + (2 / 3) * B * Cd**3
                         + nobs * B * 1.5e3)
            mfu = flops / (ms / 1e3) / PEAK_F32 * 100
            rows.append((prob.num_cameras, prob.num_points, nobs, batch,
                         backend, schur_w, ms, mfu, compile_s))
            print(f"cams={prob.num_cameras:4d} pts={prob.num_points:6d} "
                  f"obs={nobs:6d} batch={batch} {backend:6s} W={schur_w}: "
                  f"{ms:8.2f} ms/iter  MFU={mfu:.2f}%  "
                  f"first-call {compile_s:.0f}s (total {time.time()-t0:.0f}s)",
                  flush=True)
            if profile:
                for name, pms in profile_phases(layer, state, aux, backend):
                    print(f"    {name:18s}: {pms:9.3f} ms", flush=True)

    if not rows:
        print("no rows measured; nothing appended")
        return
    with open(OUT, "a") as f:
        f.write("\n## Bundle adjustment (LM, single chip)\n\n")
        f.write("| cameras | points | observations | batch | backend | W | ms/LM-iter | MFU % | first-call compile s |\n")
        f.write("|---|---|---|---|---|---|---|---|---|\n")
        for c, p, o, bz, b, w, ms, mfu, cs in rows:
            f.write(f"| {c} | {p} | {o} | {bz} | {b} | {w} | {ms:.2f} | {mfu:.2f} | {cs:.0f} |\n")
    print(f"appended to {OUT}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="16x200,64x800")
    p.add_argument("--backends", default="schur,sparse")
    p.add_argument("--bal", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--schur-w", choices=["auto", "dense", "sparse"],
                   default="auto")
    p.add_argument("--profile", action="store_true")
    a = p.parse_args()
    sizes = [tuple(int(v) for v in s.split("x")) for s in a.sizes.split(",")]
    main(sizes, a.backends.split(","), a.bal, batch=a.batch,
         schur_w=a.schur_w, profile=a.profile)
