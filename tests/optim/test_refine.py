"""Mixed-precision iterative refinement (sparse/refine.py): the TPU-native
equivalent of the reference's f64 sparse factor/solve contract
(reference optimizer/autograd/baspacho_sparse_autograd.py:41,
sparse_linearization.py:169-176 double Atb).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu import config
from theseus_tpu.sparse.refine import block_matvec, matvec_tables, refine


def random_block_system(n, d, bsz, seed, cond=1.0):
    """Chain-structured SPD block system with controllable conditioning."""
    rng = np.random.RandomState(seed)
    D = n * d
    A = rng.randn(bsz, D, D)
    H = np.einsum("bij,bkj->bik", A, A) + D * np.eye(D)
    # stretch the spectrum: scale variable blocks by a geometric ramp
    scales = np.power(cond, np.linspace(0, 1, n))[:, None] * np.ones((n, d))
    s = scales.reshape(-1)
    H = H * s[None, :, None] * s[None, None, :]
    b = rng.randn(bsz, D)
    return H, b


def blocks_from_dense(pair_slot, n_slots, H, n, d):
    bsz = H.shape[0]
    ata = np.zeros((n_slots, bsz, d, d))
    for (i, j), s in pair_slot.items():
        ata[s] = H[:, i * d : (i + 1) * d, j * d : (j + 1) * d]
    return jnp.asarray(ata)


def chain_pattern(n):
    pair_slot = {(i, i): i + 1 for i in range(n)}
    slot = n + 1
    for i in range(n - 1):
        pair_slot[(i, i + 1)] = slot
        slot += 1
    return pair_slot, slot


def dense_from_blocks(pair_slot, ata, n, d):
    bsz = ata.shape[1]
    H = np.zeros((bsz, n * d, n * d))
    for (i, j), s in pair_slot.items():
        blk = np.asarray(ata[s])
        H[:, i * d : (i + 1) * d, j * d : (j + 1) * d] = blk
        if i != j:
            H[:, j * d : (j + 1) * d, i * d : (i + 1) * d] = np.swapaxes(
                blk, -1, -2
            )
    return H


def test_block_matvec_matches_dense():
    n, d, bsz = 4, 3, 2
    pair_slot, n_slots = chain_pattern(n)
    rng = np.random.RandomState(0)
    ata = jnp.asarray(rng.randn(n_slots, bsz, d, d))
    ata = ata.at[0].set(0.0)
    tables = matvec_tables(pair_slot)
    x = jnp.asarray(rng.randn(n, bsz, d))
    y = np.asarray(block_matvec(tables, ata, x))

    # dense oracle with symmetrized diagonal (the matvec's read convention)
    ata_sym = np.asarray(ata).copy()
    for i in range(n):
        s = pair_slot[(i, i)]
        ata_sym[s] = 0.5 * (ata_sym[s] + np.swapaxes(ata_sym[s], -1, -2))
    H = dense_from_blocks(pair_slot, ata_sym, n, d)
    x_flat = np.asarray(x).transpose(1, 0, 2).reshape(bsz, -1)
    y_ref = np.einsum("bij,bj->bi", H, x_flat).reshape(bsz, n, d)
    np.testing.assert_allclose(y, y_ref.transpose(1, 0, 2), rtol=1e-12)


def test_refine_recovers_f64_accuracy_on_ill_conditioned_f32():
    """An f32 factor of a kappa~1e6 system leaves ~kappa*eps_f32 relative
    error; one f64-residual refinement sweep must reduce it by orders of
    magnitude toward the f64 oracle."""
    n, d, bsz = 6, 3, 2
    # fully dense pattern: the refinement matvec must apply the SAME
    # operator the inner solver factors (H here is dense by construction)
    pair_slot = {}
    slot = 1
    for i in range(n):
        pair_slot[(i, i)] = slot
        slot += 1
    for i in range(n):
        for j in range(i + 1, n):
            pair_slot[(i, j)] = slot
            slot += 1
    n_slots = slot
    rng = np.random.RandomState(1)
    D = n * d
    # dense SPD with geometric spectrum stretch (kappa ~ 1e6)
    A = rng.randn(bsz, D, D)
    H64 = np.einsum("bij,bkj->bik", A, A) + D * np.eye(D)
    s = np.power(1e3, np.linspace(0, 1, D))
    H64 = H64 * s[None, :, None] * s[None, None, :]
    b64 = rng.randn(bsz, D)
    x_oracle = np.linalg.solve(H64, b64[..., None])[..., 0]

    H32 = H64.astype(np.float32)
    ata32 = blocks_from_dense(pair_slot, n_slots, H32.astype(np.float64), n, d).astype(jnp.float32)
    tables = matvec_tables(pair_slot)
    b_blocks = jnp.asarray(
        b64.reshape(bsz, n, d).transpose(1, 0, 2), jnp.float32
    )

    # f32 inner solver: dense cholesky on the f32 system
    L32 = jnp.linalg.cholesky(jnp.asarray(H32))

    def inner(r_blocks):
        r = jnp.moveaxis(r_blocks, 0, 1).reshape(bsz, D)
        x = jax.scipy.linalg.cho_solve((L32, True), r[..., None])[..., 0]
        return jnp.moveaxis(x.reshape(bsz, n, d), 1, 0)

    x0 = inner(b_blocks)
    x1 = refine(
        inner,
        lambda xv: block_matvec(tables, ata32, xv, jnp.dtype("float64")),
        b_blocks, x0, steps=2,
    )

    def err(xb):
        xf = np.moveaxis(np.asarray(xb, np.float64), 0, 1).reshape(bsz, D)
        return np.max(np.abs(xf - x_oracle) / (np.abs(x_oracle) + 1e-12))

    e0, e1 = err(x0), err(x1)
    # the refined error is bounded by the f32 ROUNDING of H itself
    # (H32 vs H64: relative eps_f32 * kappa); the refinement must reach it
    assert e1 < e0 * 0.2 or e1 < 5e-4
    assert e1 < 5e-4


def test_refined_f32_reaches_f64_plateau_at_scale():
    """End-to-end plateau golden (VERDICT r4 #1): at >=2048 poses the plain
    f32 solve plateaus measurably above the f64 trajectory (2-7x in the
    published sweeps, evaluations/results_reference.md); ONE refinement
    sweep must close the gap to within a few percent of the f64 plateau.
    Slow tier (three fresh compiles of a 2048-pose program)."""
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective,
        pose_values,
        synthetic_pose_graph,
    )

    n = 2048
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n, batch=1, seed=0, dtype=jnp.float32
    )
    edges = [tuple(e) for e in np.asarray(edges)]

    def final_err(dtype, steps):
        old = config.REFINE_STEPS
        config.set_refine_steps(steps)
        try:
            obj, _ = build_pgo_objective(
                n, edges, jnp.asarray(np.asarray(meas), dtype),
                jnp.asarray(np.asarray(gt[0]), dtype), dtype=dtype,
            )
            opt = tt.LevenbergMarquardt(
                obj, max_iterations=10, adaptive_damping=True,
                linearization="sparse",
            )
            layer = tt.TheseusLayer(opt)
            _, info = layer.forward(pose_values(np.asarray(init, dtype)))
            return float(np.asarray(info.last_err).mean())
        finally:
            config.set_refine_steps(old)

    e64 = final_err(jnp.float64, 0)
    e32_refined = final_err(jnp.float32, 1)
    # the refined f32 trajectory must land within 10% of the f64 plateau
    assert e32_refined <= e64 * 1.10, (e32_refined, e64)


def test_sparse_solve_refinement_improves_residual():
    """End-to-end: sparse_block_solve's residual must shrink with
    REFINE_STEPS (the solve targets the f32-stored, diag-symmetrized H)."""
    from theseus_tpu.sparse.cholesky import NumericSchedule, sparse_block_solve
    from theseus_tpu.sparse.structure import symbolic_factor

    n, d, bsz = 8, 3, 2
    pair_slot, n_slots = chain_pattern(n)
    pairs = {k for k in pair_slot if k[0] != k[1]}
    rng = np.random.RandomState(2)
    D = n * d
    A = rng.randn(bsz, D, D)
    H = np.einsum("bij,bkj->bik", A, A) + D * np.eye(D)
    s = np.power(1e2, np.linspace(0, 1, n)).repeat(d)
    H = H * s[None, :, None] * s[None, None, :]
    # keep only the chain pattern
    mask = np.zeros((D, D), bool)
    for (i, j) in pair_slot:
        mask[i * d : (i + 1) * d, j * d : (j + 1) * d] = True
        mask[j * d : (j + 1) * d, i * d : (i + 1) * d] = True
    H = np.where(mask, H, 0.0)
    H = H + D * 10 * np.diag(s**2)  # keep SPD after masking
    b = rng.randn(bsz, D)

    sym = symbolic_factor(n, pairs, d, ordering="natural")

    class Shim:
        pass

    pattern = Shim()
    pattern.pair_slot = pair_slot
    pattern.n_vars = n
    pattern.d = d
    sched = NumericSchedule(sym, pattern)
    ata = blocks_from_dense(pair_slot, n_slots, H, n, d).astype(jnp.float32)
    bb = jnp.asarray(b.reshape(bsz, n, d).transpose(1, 0, 2), jnp.float32)

    tables = matvec_tables(pair_slot)

    def resid(x):
        r = np.asarray(bb, np.float64) - np.asarray(
            block_matvec(tables, ata, x, jnp.dtype("float64"))
        )
        return np.max(np.abs(r))

    old = config.REFINE_STEPS
    try:
        config.REFINE_STEPS = 0
        x0 = sparse_block_solve(sched, ata, bb)
        config.REFINE_STEPS = 2
        x2 = sparse_block_solve(sched, ata, bb)
    finally:
        config.REFINE_STEPS = old
    assert resid(x2) <= resid(x0) * 0.5 + 1e-10
