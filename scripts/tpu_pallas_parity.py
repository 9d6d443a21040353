"""Compiled-Pallas vs XLA parity, ON the TPU.

The Pallas kernels' unit tests run Mosaic interpret mode on CPU
(tests/optim/test_pallas_kernels.py) — correct for the kernel logic, but the
code the benchmark actually executes is the COMPILED Mosaic path on TPU
hardware. This script runs every Pallas kernel family compiled on the TPU
against the XLA path on the same inputs and reports the max deviation:

  1. fused SE3 Between linearization   (ops/pallas_between_soa.py)
  2. fused Reprojection linearization  (ops/pallas_reprojection.py)
  3. fused AtA/Atb assembly            (sparse/pallas_assemble.py)
  4. level elimination (factorize)     (sparse/pallas_factorize.py)
  5. fwd/bwd substitution (solve)      (sparse/pallas_factorize.py)
  6. whole-sweep factorize/solve       (sparse/pallas_whole.py)

Usage (TPU env):   python scripts/tpu_pallas_parity.py
Prints one JSON line; exits nonzero if any family exceeds its tolerance.
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

# f32 tolerance: the fused Between kernel uses a polynomial atan2 (~1e-7);
# jacobian entries are O(1), AtA entries O(10^2) for PGO. Relative 2e-5
# catches the bf16-class regressions (which are O(1e-2)+) with margin.
RTOL = 2e-5


def _rel_dev(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(1.0, float(np.max(np.abs(b))))
    return float(np.max(np.abs(a - b))) / scale


def main():
    import theseus_tpu as tt
    from theseus_tpu import config as cfg
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective, pose_values, synthetic_pose_graph)
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, synthetic_ba)
    from theseus_tpu.sparse.assemble import assemble, build_block_pattern
    from theseus_tpu.sparse.cholesky import (
        NumericSchedule, factorize, solve_with_factor)
    from theseus_tpu.sparse.structure import symbolic_factor

    platform = jax.devices()[0].platform
    dt = jnp.float32
    devs = {}

    def with_pallas(flag, fn, *args):
        old = cfg.USE_PALLAS
        cfg.USE_PALLAS = flag
        try:
            return jax.jit(fn)(*args)
        finally:
            cfg.USE_PALLAS = old

    # ---- PGO problem: Between kernels + assembly + factorization ----------
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=64, batch=16, seed=0, dtype=dt)
    obj, _ = build_pgo_objective(64, edges, meas, gt[0], dtype=dt)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, 16)
    aux = co.build_aux(values, 16)

    # 1. fused Between linearization
    def linearize_flat(state, aux):
        blocks = co.linearize_blocks(state, aux)
        return jax.tree_util.tree_leaves(blocks)

    on = with_pallas(True, linearize_flat, state, aux)
    off = with_pallas(False, linearize_flat, state, aux)
    devs["between_linearize"] = max(
        _rel_dev(a, b) for a, b in zip(on, off))

    # 3. assembly (+ pattern shared by 4/5)
    pattern = build_block_pattern(co)

    def do_assemble(state, aux):
        blocks = co.linearize_blocks(state, aux)
        return assemble(pattern, co, blocks)

    # hold the residual path fixed (XLA) so only assembly differs
    def assemble_xla_blocks(state, aux):
        blocks = co.linearize_blocks(state, aux)
        return blocks

    blocks_fixed = with_pallas(False, assemble_xla_blocks, state, aux)
    ata_on, atb_on = with_pallas(
        True, lambda b: assemble(pattern, co, b), blocks_fixed)
    ata_off, atb_off = with_pallas(
        False, lambda b: assemble(pattern, co, b), blocks_fixed)
    devs["assemble_ata"] = _rel_dev(ata_on, ata_off)
    devs["assemble_atb"] = _rel_dev(atb_on, atb_off)

    # 4/5. factorization + substitution on the same (damped) system
    sym = symbolic_factor(pattern.n_vars, pattern.pairs, pattern.d, "nd")
    sched = NumericSchedule(sym, pattern)
    from theseus_tpu.sparse.assemble import apply_block_damping

    ata_d = jax.jit(
        lambda a: apply_block_damping(pattern, a, 1e-3, True, 1e-8)
    )(ata_off)

    l_on = with_pallas(True, lambda a: factorize(sched, a), ata_d)
    l_off = with_pallas(False, lambda a: factorize(sched, a), ata_d)
    devs["factorize_levels"] = _rel_dev(l_on, l_off)

    x_on = with_pallas(
        True, lambda l, b: solve_with_factor(sched, l, b), l_off, atb_off)
    x_off = with_pallas(
        False, lambda l, b: solve_with_factor(sched, l, b), l_off, atb_off)
    devs["substitution"] = _rel_dev(x_on, x_off)

    # 6. whole-sweep kernels (sparse/pallas_whole.py): factorize + both
    # substitution sweeps as one Mosaic program each, vs the XLA paths.
    # Default-off in production (slower than per-level; config.PALLAS_WHOLE)
    # but hardware parity is still pinned here every round.
    from theseus_tpu.sparse import pallas_whole as pw

    if sched.tail_k == 0:
        lsoa = jax.jit(lambda a: pw.factorize_whole(sched, a))(ata_d)
        from theseus_tpu.sparse.pallas_factorize import soa_to_aos

        nnz1 = sched.sym.nnz_l + 1
        d = pattern.d
        laos = soa_to_aos(lsoa[:nnz1, : d * d, :16], d)
        devs["factorize_whole"] = _rel_dev(laos, l_off)
        xw = jax.jit(lambda l, b: pw.solve_whole(sched, l, b))(lsoa, atb_off)
        devs["solve_whole"] = _rel_dev(xw, x_off)

    # ---- BA problem: fused Reprojection -----------------------------------
    prob = synthetic_ba(num_cameras=8, num_points=60, batch=4, seed=0,
                        visibility=0.6, dtype=dt)
    obj_ba, _, _ = build_ba_objective(prob, dtype=dt,
                                      gauge_target=prob.gt_poses[0])
    co_ba = obj_ba.compile()
    vals_ba = obj_ba.default_values(ba_values(prob))
    state_ba = co_ba.pack(vals_ba, 4)
    aux_ba = co_ba.build_aux(vals_ba, 4)

    def lin_ba(state, aux):
        return jax.tree_util.tree_leaves(co_ba.linearize_blocks(state, aux))

    on = with_pallas(True, lin_ba, state_ba, aux_ba)
    off = with_pallas(False, lin_ba, state_ba, aux_ba)
    devs["reprojection_linearize"] = max(
        _rel_dev(a, b) for a, b in zip(on, off))

    ok = all(v <= RTOL for v in devs.values())
    print(json.dumps({
        "tpu_pallas_parity": "ok" if ok else "FAIL",
        "platform": platform,
        "rtol": RTOL,
        "max_rel_dev": devs,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
