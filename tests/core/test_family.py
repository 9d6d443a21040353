"""Bulk-construction (VariableFamily/CostFamily) parity contract.

A CostFamily must be numerically identical to adding its N per-instance
costs one by one (the reference's construction style,
examples/bundle_adjustment.py:112) — same residuals, same optimum — while
being O(1) in Python objects and trace operands."""

import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.utils.examples.bundle_adjustment import (
    ba_values,
    build_ba_objective,
    synthetic_ba,
)


def _build_pair(robust=False):
    prob = synthetic_ba(num_cameras=4, num_points=12, batch=2, seed=3,
                        visibility=0.7)
    kw = dict(gauge_target=prob.gt_poses[0])
    if robust:
        kw.update(robust_loss_cls=tt.HuberLoss, log_loss_radius=0.1)
    obj_f, cam_fam, pt_fam = build_ba_objective(prob, use_families=True, **kw)
    obj_p, cams, pts = build_ba_objective(prob, use_families=False, **kw)
    return prob, (obj_f, cam_fam, pt_fam), (obj_p, cams, pts)


@pytest.mark.parametrize("robust", [False, True])
def test_family_error_matches_per_cost(robust):
    prob, (obj_f, *_), (obj_p, *_) = _build_pair(robust)
    vf = obj_f.default_values(ba_values(prob, use_families=True))
    vp = obj_p.default_values(ba_values(prob, use_families=False))
    ef = np.asarray(obj_f.error(values=vf))
    ep = np.asarray(obj_p.error(values=vp))
    np.testing.assert_allclose(ef, ep, rtol=1e-12, atol=1e-12)
    mf = np.asarray(obj_f.error_metric(values=vf))
    mp = np.asarray(obj_p.error_metric(values=vp))
    np.testing.assert_allclose(mf, mp, rtol=1e-12)


def test_family_lm_solution_matches_per_cost():
    prob, (obj_f, *_), (obj_p, *_) = _build_pair()
    sol = {}
    for tag, obj, fam in (("f", obj_f, True), ("p", obj_p, False)):
        opt = tt.LevenbergMarquardt(obj, max_iterations=6,
                                    adaptive_damping=True,
                                    linearization="schur")
        layer = tt.TheseusLayer(opt)
        values, info = layer.forward(ba_values(prob, use_families=fam))
        sol[tag] = (values, np.asarray(info.best_err))
    np.testing.assert_allclose(sol["f"][1], sol["p"][1], rtol=1e-8)
    cams_f = np.asarray(sol["f"][0]["cam"])  # (C, B, 3, 4)
    for i in range(prob.num_cameras):
        np.testing.assert_allclose(
            cams_f[i], np.asarray(sol["p"][0][f"cam_{i}"]), rtol=1e-6, atol=1e-7
        )
    pts_f = np.asarray(sol["f"][0]["pt"])
    for i in range(prob.num_points):
        np.testing.assert_allclose(
            pts_f[i], np.asarray(sol["p"][0][f"pt_{i}"]), rtol=1e-5, atol=1e-6
        )


def test_family_sparse_backend_matches_dense():
    prob, (obj_f, *_), _ = _build_pair()
    errs = {}
    for backend in ("dense", "sparse", "schur"):
        opt = tt.LevenbergMarquardt(obj_f, max_iterations=5,
                                    adaptive_damping=True,
                                    linearization=backend)
        layer = tt.TheseusLayer(opt)
        _, info = layer.forward(ba_values(prob))
        errs[backend] = np.asarray(info.best_err)
    np.testing.assert_allclose(errs["dense"], errs["sparse"], rtol=1e-6)
    np.testing.assert_allclose(errs["dense"], errs["schur"], rtol=1e-6)


def test_member_view_in_regular_cost():
    """Gauge-style: a member view used by an ordinary cost function."""
    fam = tt.VectorFamily(3, count=5, name="x")
    obj = tt.Objective(dtype=jnp.float64)
    target = jnp.asarray(np.arange(3, dtype=np.float64))[None]
    obj.add(tt.Local(fam[2], target, tt.ScaleCostWeight(1.0), name="pin"))
    # family constrains members {0, 1, 3, 4}; the member-view pin covers 2
    idx = np.array([0, 1, 3, 4])
    template = tt.Local(
        fam[0], tt.Variable(np.zeros((4, 1, 3)), name="targets"),
        tt.ScaleCostWeight(1.0), name="tmpl",
    )
    obj.add(tt.CostFamily(template, members=[(fam, idx)], name="zeros"))
    opt = tt.GaussNewton(obj, max_iterations=4)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward({"x": np.ones((5, 1, 3))})
    x = np.asarray(values["x"])  # (5, 1, 3)
    np.testing.assert_allclose(x[2, 0], np.arange(3), atol=1e-8)
    np.testing.assert_allclose(x[[0, 1, 3, 4]], 0.0, atol=1e-8)


def test_family_outer_gradient_flows_through_stacked_aux():
    """Outer-loop learning: gradients w.r.t. the stacked aux (per-instance
    measurements) must flow through the layer."""
    import jax

    fam = tt.VectorFamily(2, count=3, name="v")
    idx = np.arange(3)
    targets0 = np.ones((3, 1, 2))

    def loss(targets):
        obj = tt.Objective(dtype=jnp.float64)
        template = tt.Local(
            fam[0], tt.Variable(targets, name="targets"),
            tt.ScaleCostWeight(1.0), name="tmpl",
        )
        obj.add(tt.CostFamily(template, members=[(fam, idx)], name="fit"))
        opt = tt.GaussNewton(obj, max_iterations=3)
        layer = tt.TheseusLayer(opt)
        co = obj.compile()
        values = obj.default_values({"v": np.zeros((3, 1, 2))})
        values["targets"] = targets
        state = co.pack(values, 1)
        aux = co.build_aux(values, 1)
        carry = layer.solve_state(state, aux, "unroll", opt.opts)
        sol = co.unpack(carry["state"])["v"]
        return jnp.sum(sol**2)

    g = jax.grad(loss)(jnp.asarray(targets0))
    # at the optimum v == targets, so d(sum v^2)/dtargets = 2*targets
    np.testing.assert_allclose(np.asarray(g), 2 * targets0, atol=1e-6)


def test_erase_family_cost():
    fam = tt.VectorFamily(2, count=3, name="w")
    obj = tt.Objective(dtype=jnp.float64)
    template = tt.Local(
        fam[0], tt.Variable(np.zeros((3, 1, 2)), name="t0"),
        tt.ScaleCostWeight(1.0), name="tmpl",
    )
    obj.add(tt.CostFamily(template, members=[(fam, np.arange(3))], name="fit"))
    assert "w" in obj.var_families
    obj.erase("fit")
    assert "w" not in obj.var_families
    assert obj.size_cost_functions() == 0
