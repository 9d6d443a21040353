"""Schur-complement backend: solutions must match the dense backend exactly
on bundle-adjustment problems (cameras + eliminated landmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.utils.examples.bundle_adjustment import (
    ba_values,
    build_ba_objective,
    synthetic_ba,
)


def build(seed=0, batch=1):
    prob = synthetic_ba(num_cameras=4, num_points=10, batch=batch, seed=seed,
                        visibility=0.7)
    obj, cams, pts = build_ba_objective(prob, gauge_target=prob.gt_poses[0])
    # pin monocular scale: otherwise the reduced camera system S is exactly
    # singular (free gauge) and the Schur backend correctly reports failure
    obj.add(tt.Local(pts[0], prob.gt_points[0],
                     tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64)),
                     name="scale_pin"))
    return prob, obj


def test_schur_delta_matches_dense():
    prob, obj = build()
    co = obj.compile()
    values = obj.default_values(ba_values(prob))
    state = co.pack(values, 1)
    aux = co.build_aux(values, 1)
    from theseus_tpu.optim.normal import DenseNormalBuilder
    from theseus_tpu.optim.schur import SchurNormalBuilder, eliminate_points

    ns_d = DenseNormalBuilder(co).build(state, aux)
    ns_s = SchurNormalBuilder(co, eliminate_points).build(state, aux)
    for damping in (0.0, 1e-2):
        dd, _ = ns_d.solve(damping, False)
        ds, _ = ns_s.solve(damping, False)
        np.testing.assert_allclose(np.asarray(dd), np.asarray(ds), rtol=1e-7, atol=1e-9)
    # quad/diag agree too
    v = jax.random.normal(jax.random.PRNGKey(0), dd.shape, dtype=dd.dtype)
    np.testing.assert_allclose(ns_d.quad(v), ns_s.quad(v), rtol=1e-9)
    np.testing.assert_allclose(ns_d.diag(), ns_s.diag(), rtol=1e-9)


def test_schur_ba_end_to_end():
    prob, obj = build(seed=1, batch=2)
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=15, adaptive_damping=True, linearization="schur"
    )
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(ba_values(prob))
    init_err = np.asarray(obj.error_metric(values=obj.default_values(ba_values(prob))))
    final_err = np.asarray(obj.error_metric(values=values))
    assert np.all(final_err < 1e-4 * init_err)


def test_schur_rejects_coupled_landmarks():
    # a cost coupling two eliminated vars must be refused
    p1, p2 = tt.Point3(name="a"), tt.Point3(name="b")
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(tt.Between(p1, p2, jnp.zeros((1, 3), jnp.float64)))
    from theseus_tpu.optim.schur import SchurNormalBuilder, eliminate_points

    with pytest.raises(ValueError):
        SchurNormalBuilder(obj.compile(), eliminate_points)


@pytest.mark.parametrize("w_path", ["dense", "chunked"])
def test_schur_mixed_dof_slice_equivalence(w_path):
    """Regression trap for the (dc, dp) mixed-dof slicing: the same BA
    problem solved with the sliced axes (cam dof 6, point dof 3) must match
    the pre-slice uniform-d path (pt_d = cam_d = d forced) bit-for-bit to
    solver tolerance, on BOTH the dense-W and chunked elimination branches.
    A silent d-vs-dp reshape regression in either branch breaks this."""
    from theseus_tpu import config as cfg
    from theseus_tpu.optim.schur import SchurNormalBuilder, eliminate_points

    prob, obj = build(seed=3, batch=2)
    co = obj.compile()
    values = obj.default_values(ba_values(prob))
    state = co.pack(values, 2)
    aux = co.build_aux(values, 2)

    old = cfg.SCHUR_DENSE_BUDGET_BYTES
    try:
        if w_path == "chunked":
            cfg.set_schur_dense_budget(0)

        bld = SchurNormalBuilder(co, eliminate_points)
        assert bld.pt_d < bld.pattern.d  # the slice is actually active
        ns = bld.build(state, aux)
        d_sliced, _ = ns.solve(1e-3, False)

        bld_u = SchurNormalBuilder(co, eliminate_points)
        bld_u.pt_d = bld_u.pattern.d  # force the pre-slice uniform-d path
        bld_u.cam_d = bld_u.pattern.d
        ns_u = bld_u.build(state, aux)
        d_uniform, _ = ns_u.solve(1e-3, False)
    finally:
        cfg.set_schur_dense_budget(old)

    np.testing.assert_allclose(
        np.asarray(d_sliced), np.asarray(d_uniform), rtol=1e-9, atol=1e-12
    )


def test_schur_dense_vs_chunked_elimination():
    """The MXU dense-W path and the scanned chunk path must agree."""
    from theseus_tpu import config as cfg
    from theseus_tpu.utils.examples.bundle_adjustment import (
        ba_values, build_ba_objective, synthetic_ba)

    prob = synthetic_ba(num_cameras=6, num_points=40, batch=2, seed=1,
                        visibility=0.5)
    obj, cams, pts = build_ba_objective(prob, gauge_target=prob.gt_poses[0])
    obj.add(tt.Local(pts[0], prob.gt_points[0], tt.ScaleCostWeight(1e3),
                     name="pt_gauge"))

    def solve():
        opt = tt.LevenbergMarquardt(obj, max_iterations=6,
                                    adaptive_damping=True,
                                    linearization="schur")
        layer = tt.TheseusLayer(opt)
        _, info = layer.forward(ba_values(prob))
        return np.asarray(info.best_err)

    e_dense = solve()
    old = cfg.SCHUR_DENSE_BUDGET_BYTES
    try:
        cfg.set_schur_dense_budget(0)  # force the chunked lax.scan path
        e_chunk = solve()
    finally:
        cfg.set_schur_dense_budget(old)
    np.testing.assert_allclose(e_dense, e_chunk, rtol=1e-9)
