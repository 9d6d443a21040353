"""Level-RUN scanning (config.LEVEL_RUNS): factorize/solve parity with the
unrolled per-level sweeps, including dense-tail problems, sampling path
untouched, and the gradient (custom VJP factorization-reuse) path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu import config as tt_config
from theseus_tpu.optim.normal import SparseNormalBuilder
from theseus_tpu.sparse.cholesky import _use_runs, sparse_block_solve
from theseus_tpu.utils.examples.pose_graph import (
    build_pgo_objective, pose_values, synthetic_pose_graph)


def _pgo_system(n_poses=64, batch=4, dtype=jnp.float64, ordering="auto"):
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=dtype
    )
    obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0], dtype=dtype)
    co = obj.compile()
    bld = SparseNormalBuilder(co, ordering=ordering)
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    ns = bld.build(state, aux)
    return bld, ns


@pytest.fixture
def force_runs():
    tt_config.set_level_runs(True)
    yield
    tt_config.set_level_runs("auto")


def test_runs_built_and_fewer_than_levels():
    bld, _ = _pgo_system(n_poses=64)
    sched = bld.sched
    assert sched.level_tables, "test assumes the level plan is active"
    assert sched.level_runs
    assert len(sched.level_runs) < len(sched.level_tables)
    assert sum(r["L"] for r in sched.level_runs) == len(sched.level_tables)


def test_run_solve_matches_unrolled(force_runs):
    bld, ns = _pgo_system(n_poses=64)
    assert _use_runs(bld.sched)
    x_runs, fail = ns.solve(0.0, False)
    assert not bool(jnp.any(fail))
    tt_config.set_level_runs(False)
    x_ref, _ = ns.solve(0.0, False)
    np.testing.assert_allclose(
        np.asarray(x_runs), np.asarray(x_ref), rtol=1e-10, atol=1e-12
    )


def test_run_solve_matches_dense_oracle(force_runs):
    bld, ns = _pgo_system(n_poses=32, batch=2)
    x, fail = ns.solve(1e-3, False)
    tt_config.set_level_runs(False)
    x_ref, _ = ns.solve(1e-3, False)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=1e-10, atol=1e-12
    )


def test_run_solve_with_dense_tail(force_runs):
    """BA-like bipartite system exercises the dense-tail + runs interop."""
    from theseus_tpu.utils.examples.bundle_adjustment import (
        build_ba_objective, synthetic_ba)

    prob = synthetic_ba(num_cameras=8, num_points=60, batch=1, seed=0,
                        dtype=jnp.float64)
    obj, _, pts = build_ba_objective(prob, gauge_target=prob.gt_poses[0])
    obj.add(tt.Local(pts[0], prob.gt_points[0],
                     tt.ScaleCostWeight(jnp.asarray(100.0, jnp.float64)),
                     name="scale_pin"))
    co = obj.compile()
    bld = SparseNormalBuilder(co, ordering="auto")
    values = obj.default_values()
    b = co.resolve_batch_size(values)
    ns = bld.build(co.pack(values, b), co.build_aux(values, b))
    sched = bld.sched
    if not sched.use_levels or not sched.tail_k:
        pytest.skip("level plan or dense tail inactive on this structure")
    x, fail = ns.solve(1e-4, False)
    tt_config.set_level_runs(False)
    x_ref, fail_ref = ns.solve(1e-4, False)
    # parity with the unrolled path, including its fail mask
    np.testing.assert_array_equal(np.asarray(fail), np.asarray(fail_ref))
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=1e-9, atol=1e-11
    )


def test_run_gradients_match_unrolled(force_runs):
    """Custom-VJP path (factorization reuse) under runs == unrolled."""
    bld, ns = _pgo_system(n_poses=48, batch=2)
    sched = bld.sched
    ata, atb = ns.ata, ns.atb_blocks

    def loss(ata, atb, runs):
        tt_config.set_level_runs(runs)
        try:
            x = sparse_block_solve(sched, ata, atb)
        finally:
            tt_config.set_level_runs("auto")
        return jnp.sum(x**2)

    g_runs = jax.grad(loss, argnums=(0, 1))(ata, atb, True)
    g_ref = jax.grad(loss, argnums=(0, 1))(ata, atb, False)
    for gr, gf in zip(g_runs, g_ref):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gf), rtol=1e-9, atol=1e-11
        )


def test_full_lm_solve_unchanged_under_runs(force_runs):
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=48, batch=2, seed=1, dtype=jnp.float64
    )
    obj, _ = build_pgo_objective(48, edges, meas, gt[0], dtype=jnp.float64)
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=8, adaptive_damping=True, linearization="sparse"
    )
    out_runs, info_runs = opt.optimize(
        obj.default_values(pose_values(init))
    )
    tt_config.set_level_runs(False)
    opt2 = tt.LevenbergMarquardt(
        obj, max_iterations=8, adaptive_damping=True, linearization="sparse"
    )
    out_ref, info_ref = opt2.optimize(
        obj.default_values(pose_values(init))
    )
    np.testing.assert_allclose(
        np.asarray(info_runs.last_err), np.asarray(info_ref.last_err),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_runs["pose_0"]) if "pose_0" in out_runs else
        np.asarray(list(out_runs.values())[0]),
        np.asarray(out_ref["pose_0"]) if "pose_0" in out_ref else
        np.asarray(list(out_ref.values())[0]),
        rtol=1e-8, atol=1e-10,
    )


def test_sample_with_factor_under_runs(force_runs):
    """Sampling back-substitution parity: runs vs unrolled levels."""
    from theseus_tpu.sparse.assemble import apply_block_damping
    from theseus_tpu.sparse.cholesky import factorize, sample_with_factor

    bld, ns = _pgo_system(n_poses=48, batch=2)
    sched = bld.sched
    ata = apply_block_damping(bld.pattern, ns.ata, 1e-3, False,
                              bld.damping_eps)
    lflat = factorize(sched, ata)
    y = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(sched.sym.n, 2, bld.pattern.d)
        )
    )
    x_runs = sample_with_factor(sched, lflat, y)
    tt_config.set_level_runs(False)
    x_ref = sample_with_factor(sched, lflat, y)
    np.testing.assert_allclose(
        np.asarray(x_runs), np.asarray(x_ref), rtol=1e-10, atol=1e-12
    )


def test_pallas_kernels_inside_run_scan_interpret(monkeypatch):
    """The Pallas per-level kernels composed INSIDE the run lax.scan
    (interpret mode on CPU) match the XLA runs path — de-risks the
    compiled-Mosaic-in-scan composition before it hits hardware."""
    from theseus_tpu.sparse import cholesky as ch
    from theseus_tpu.sparse.assemble import apply_block_damping

    bld, ns = _pgo_system(n_poses=64, batch=4, dtype=jnp.float32)
    sched = bld.sched
    ata = apply_block_damping(bld.pattern, ns.ata, 1e-3, False,
                              bld.damping_eps)
    tt_config.set_level_runs(True)
    try:
        l_ref = ch._factorize_level_runs(sched, ata)  # XLA bodies
        monkeypatch.setattr(ch, "_pallas_run_ok", lambda *a, **k: True)
        monkeypatch.setattr(tt_config, "_PALLAS_INTERPRET", True)
        l_pal = ch._factorize_level_runs(sched, ata)
        np.testing.assert_allclose(
            np.asarray(l_pal), np.asarray(l_ref), atol=2e-5
        )
        atb = ns.atb_blocks
        x_pal = ch._solve_level_runs(sched, l_ref, atb)
        monkeypatch.setattr(ch, "_pallas_run_ok", lambda *a, **k: False)
        x_ref = ch._solve_level_runs(sched, l_ref, atb)
        np.testing.assert_allclose(
            np.asarray(x_pal), np.asarray(x_ref), atol=2e-4
        )
    finally:
        tt_config.set_level_runs("auto")
