"""Pallas fused-kernel parity (interpret mode on CPU): the SoA Between
linearization must match the pure-JAX analytic path to f32 tolerance
(polynomial atan2 caps accuracy ~1e-6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu
from theseus_tpu import config as tt_config
from theseus_tpu.lie import se3
from theseus_tpu.ops.pallas_between_soa import between_linearize_soa
from theseus_tpu.ops.pallas_math import atan2_poly


def test_atan2_poly_accuracy():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    np.testing.assert_allclose(
        atan2_poly(y, x), np.arctan2(np.asarray(y), np.asarray(x)), atol=2e-6
    )
    # quadrant edges
    for yy, xx in [(0.0, 1.0), (1.0, 0.0), (0.0, -1.0), (-1.0, 0.0), (0.0, 0.0)]:
        np.testing.assert_allclose(
            float(atan2_poly(jnp.float32(yy), jnp.float32(xx))),
            np.arctan2(yy, xx), atol=2e-6,
        )


def test_fused_between_matches_reference():
    key = jax.random.PRNGKey(0)
    K, B = 8, 8
    v1 = se3.rand(key, K, B, dtype=jnp.float32)
    v2 = se3.rand(jax.random.PRNGKey(1), K, B, dtype=jnp.float32)
    m = se3.rand(jax.random.PRNGKey(2), K, B, dtype=jnp.float32)
    j1, j2, err = between_linearize_soa(v1, v2, m, interpret=True)

    diff = se3.compose(se3.inverse(v1), v2)
    (jl,), res = se3.jlog(se3.compose(se3.inverse(m), diff))
    r1 = -(jl @ se3.adjoint(se3.inverse(diff)))
    np.testing.assert_allclose(np.asarray(err), np.asarray(res), atol=5e-6)
    np.testing.assert_allclose(np.asarray(j2), np.asarray(jl), atol=5e-6)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(r1), atol=5e-6)


def test_fused_path_in_full_solve():
    """Force-enable the fused path (interpret mode) and check the PGO solve
    matches the vmap path."""
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective, pose_values, synthetic_pose_graph)
    import theseus_tpu as tt

    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=8, batch=2, dtype=jnp.float32
    )
    sols = {}
    for tag, enabled in (("vmap", False), ("fused", True)):
        obj, _ = build_pgo_objective(8, edges, meas, gt[0], dtype=jnp.float32)
        opt = tt.GaussNewton(obj, max_iterations=5)
        layer = tt.TheseusLayer(opt)
        tt_config.USE_PALLAS = enabled
        tt_config._PALLAS_INTERPRET = True
        try:
            values, info = layer.forward(pose_values(init))
        finally:
            tt_config.USE_PALLAS = "auto"
            tt_config._PALLAS_INTERPRET = False
        sols[tag] = values
    for k in (f"pose_{i}" for i in range(8)):
        np.testing.assert_allclose(
            sols["vmap"][k], sols["fused"][k], atol=1e-4
        )


def test_fused_path_gradients():
    """Outer gradients through the fused kernel (custom VJP -> pure-JAX
    backward) match the vmap path."""
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective, pose_values, synthetic_pose_graph)

    gt, edges, meas, init = synthetic_pose_graph(n_poses=6, batch=1, dtype=jnp.float32)

    def grad_of(enabled):
        obj, _ = build_pgo_objective(6, edges, meas, gt[0], dtype=jnp.float32)
        opt = tt.GaussNewton(obj, max_iterations=4)
        layer = tt.TheseusLayer(opt)
        co = obj.compile()
        values = obj.default_values(pose_values(init))
        state = co.pack(values, 1)
        tt_config.USE_PALLAS = enabled
        tt_config._PALLAS_INTERPRET = True
        try:
            def f(theta):
                aux = co.build_aux(values, 1)
                aux = jax.tree_util.tree_map(lambda a: a * theta, aux)
                carry = layer.solve_state(state, aux, "implicit", opt.opts)
                return jnp.sum(carry["state"]["SE3"] ** 2)
            return float(jax.grad(f)(jnp.asarray(1.05, jnp.float32)))
        finally:
            tt_config.USE_PALLAS = "auto"
            tt_config._PALLAS_INTERPRET = False

    g_vmap = grad_of(False)
    g_fused = grad_of(True)
    np.testing.assert_allclose(g_fused, g_vmap, rtol=2e-3)


@pytest.mark.parametrize(
    "K,B",
    [
        (8, 8),    # fold = 16
        (5, 1),    # fold = 128 (BA batch-1 layout), K padded
        (4, 3),    # 128 % 3 != 0 -> no fold, lane-padded path
        (2, 128),  # fold = 1, full lanes
    ],
)
def test_fused_reprojection_matches_autodiff(K, B):
    """Closed-form fused Reprojection jacobians vs the jacfwd path, across
    the observation-folding regimes (fold = 128//B when B divides 128)."""
    import theseus_tpu as tt
    from theseus_tpu.ops.pallas_reprojection import (
        _reference_linearize, reprojection_linearize_soa)

    key = jax.random.PRNGKey(0)
    pose = se3.rand(key, K, B, dtype=jnp.float32)
    point = jax.random.normal(jax.random.PRNGKey(1), (K, B, 3), dtype=jnp.float32)
    point = point + jnp.asarray([0.0, 0.0, 5.0], jnp.float32)
    focal = jnp.full((K, B, 1), 500.0, jnp.float32)
    feat = jax.random.normal(jax.random.PRNGKey(2), (K, B, 2), dtype=jnp.float32)
    k1 = jnp.full((K, B, 1), 0.01, jnp.float32)
    k2 = jnp.full((K, B, 1), -0.005, jnp.float32)

    jpose, jpt, err = reprojection_linearize_soa(
        pose, point, focal, feat, k1, k2, interpret=True
    )
    # closed-form reference
    rp, rt, re = _reference_linearize(pose, point, focal, feat, k1, k2)
    np.testing.assert_allclose(np.asarray(err), np.asarray(re), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jpose), np.asarray(rp), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(jpt), np.asarray(rt), rtol=1e-3, atol=1e-2)

    # closed form vs the cost function's autodiff path (jacfwd through retract)
    cf = tt.Reprojection(tt.SE3(name="c"), tt.Point3(name="p"),
                         focal_length=focal[0, :, :], image_feature_point=feat[0],
                         calib_k1=k1[0], calib_k2=k2[0])
    jfn = cf.jacobians_fn()
    (ja, jb), e = jax.vmap(
        lambda a, b, f_, ft, ka, kb: jfn((a, b), (f_, ft, ka, kb))
    )(pose[0], point[0], focal[0], feat[0], k1[0], k2[0])
    np.testing.assert_allclose(np.asarray(rp[0]), np.asarray(ja), rtol=1e-3, atol=0.2)
    np.testing.assert_allclose(np.asarray(rt[0]), np.asarray(jb), rtol=1e-3, atol=0.2)


def test_fused_reprojection_in_ba_step():
    """One damped GN step on a BA problem: fused vs vmap linearization give
    the same delta (full f32 BA trajectories bifurcate at focal=1000, so we
    compare a single deterministic step)."""
    from theseus_tpu.optim.normal import DenseNormalBuilder
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, synthetic_ba)
    import theseus_tpu as tt

    # normalized camera (focal 1): keeps the f32 normal equations well
    # conditioned so the two linearization paths give comparable deltas
    prob = synthetic_ba(num_cameras=3, num_points=8, batch=1, seed=0,
                        visibility=0.8, focal=1.0, pixel_noise=1e-5,
                        dtype=jnp.float32)
    obj, cams, pts = build_ba_objective(prob, dtype=jnp.float32,
                                        gauge_target=prob.gt_poses[0])
    co = obj.compile()
    values = obj.default_values(ba_values(prob))
    state = co.pack(values, 1)
    aux = co.build_aux(values, 1)
    deltas = {}
    for tag, enabled in (("vmap", False), ("fused", True)):
        tt_config.USE_PALLAS = enabled
        tt_config._PALLAS_INTERPRET = True
        try:
            ns = DenseNormalBuilder(co).build(state, aux)
            d, _ = ns.solve(1e-2, False)
        finally:
            tt_config.USE_PALLAS = "auto"
            tt_config._PALLAS_INTERPRET = False
        deltas[tag] = np.asarray(d)
    scale = np.abs(deltas["vmap"]).max()
    np.testing.assert_allclose(
        deltas["fused"], deltas["vmap"], atol=2e-3 * max(scale, 1.0)
    )


def test_pallas_level_factorize_matches_jax():
    """Fused per-level POTRF/TRSM kernel == pure-JAX level sweep (interpret)."""
    from test_sparse import blocks_from_dense, random_block_system

    from theseus_tpu.sparse.cholesky import (
        NumericSchedule, _factorize_levels, _factorize_levels_pallas)
    from theseus_tpu.sparse.structure import symbolic_factor

    for n, d, bsz, ordering in [(12, 6, 4, "nd")]:
        pairs, H, b = random_block_system(n, d, bsz, seed=n)
        sym = symbolic_factor(n, pairs, d, ordering=ordering)

        pair_slot = {}
        slot = 1
        for i in range(n):
            pair_slot[(i, i)] = slot
            slot += 1
        for (i, j) in sorted(pairs):
            pair_slot[(i, j)] = slot
            slot += 1

        class Shim:
            pass

        pattern = Shim()
        pattern.pair_slot = pair_slot
        pattern.n_vars = n
        pattern.d = d
        sched = NumericSchedule(sym, pattern)
        if not sched.use_levels:
            continue

        ata = blocks_from_dense(pair_slot, slot, H, n, d).astype(jnp.float32)
        ref = _factorize_levels(sched, ata)
        got = _factorize_levels_pallas(sched, ata, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_assemble_matches_jax():
    """Fused AtA/Atb assembly kernel == XLA assembly path (interpret)."""
    from theseus_tpu.sparse.assemble import assemble, build_block_pattern
    from theseus_tpu.sparse.pallas_assemble import assemble_pallas
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective, pose_values, synthetic_pose_graph)

    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=10, batch=2, seed=0, dtype=jnp.float32)
    obj, _ = build_pgo_objective(10, edges, meas, gt[0], dtype=jnp.float32)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, 2)
    aux = co.build_aux(values, 2)
    blocks = co.linearize_blocks(state, aux)
    pattern = build_block_pattern(co)
    ata_ref, atb_ref = assemble(pattern, co, blocks)
    ata_p, atb_p = assemble_pallas(pattern, co, blocks, interpret=True)
    np.testing.assert_allclose(np.asarray(ata_p), np.asarray(ata_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(atb_p), np.asarray(atb_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_substitution_matches_jax():
    """Fused per-level fwd/bwd substitution kernels == XLA level sweeps."""
    from test_sparse import blocks_from_dense, random_block_system

    from theseus_tpu.sparse.cholesky import (
        NumericSchedule, _solve_levels, _solve_levels_pallas, factorize)
    from theseus_tpu.sparse.structure import symbolic_factor

    n, d, bsz = 12, 6, 4
    pairs, H, b = random_block_system(n, d, bsz, seed=n)
    sym = symbolic_factor(n, pairs, d, ordering="nd")
    pair_slot = {}
    slot = 1
    for i in range(n):
        pair_slot[(i, i)] = slot
        slot += 1
    for (i, j) in sorted(pairs):
        pair_slot[(i, j)] = slot
        slot += 1

    class Shim:
        pass

    pattern = Shim()
    pattern.pair_slot = pair_slot
    pattern.n_vars = n
    pattern.d = d
    sched = NumericSchedule(sym, pattern)
    assert sched.use_levels

    ata = blocks_from_dense(pair_slot, slot, H, n, d).astype(jnp.float32)
    bb = jnp.asarray(
        np.asarray(b).reshape(bsz, n, d).transpose(1, 0, 2)
    ).astype(jnp.float32)
    lflat = factorize(sched, ata)
    x_ref = np.asarray(_solve_levels(sched, lflat, bb))
    x_pal = np.asarray(_solve_levels_pallas(sched, lflat, bb, interpret=True))
    np.testing.assert_allclose(x_pal, x_ref, rtol=2e-5, atol=2e-5)
