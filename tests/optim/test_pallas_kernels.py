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
