"""Gaussian Belief Propagation: exactness on trees, convergence on loopy
graphs, layer/backward-mode composition, posterior marginals.

Anchors: on a tree factor graph, synchronous GBP converges to the exact
normal-equation solution AND exact per-variable marginal information in
at most `diameter` sweeps; the dense Cholesky path is the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.lie import se2
from theseus_tpu.optim.gbp import GBPNormalBuilder


def _chain(n=6, batch=2, seed=0):
    """SE2 odometry chain (a tree): prior on x0 + between factors.
    Returns (objective, gt group elements list)."""
    rng = np.random.default_rng(seed)
    gt_t = []
    cur = np.zeros((batch, 3))
    for _ in range(n):
        gt_t.append(cur.copy())
        cur = cur + rng.normal(scale=0.4, size=(batch, 3))
    gt = [se2.exp(jnp.asarray(t)) for t in gt_t]

    obj = tt.Objective()
    poses = []
    for i in range(n):
        init = se2.exp(
            jnp.asarray(gt_t[i] + rng.normal(scale=0.15, size=(batch, 3)))
        )
        poses.append(tt.SE2(tensor=init, name=f"x{i}"))
    obj.add(
        tt.Difference(
            poses[0], tt.SE2(tensor=gt[0], name="prior_t"),
            tt.ScaleCostWeight(10.0), name="prior",
        )
    )
    for i in range(n - 1):
        meas = se2.compose(se2.inverse(gt[i]), gt[i + 1])
        obj.add(
            tt.Between(
                poses[i], poses[i + 1],
                tt.SE2(tensor=meas, name=f"m{i}"),
                tt.ScaleCostWeight(1.0), name=f"odo{i}",
            )
        )
    return obj, gt, poses


def _loopy(n=8, batch=2, seed=3):
    """Loopy SE2 pose graph: chain + two loop closures."""
    obj, gt, poses = _chain(n, batch, seed)
    for (i, j) in [(0, n - 1), (1, n // 2)]:
        meas = se2.compose(se2.inverse(gt[i]), gt[j])
        obj.add(
            tt.Between(
                poses[i], poses[j],
                tt.SE2(tensor=meas, name=f"lcm{i}_{j}"),
                tt.ScaleCostWeight(1.0), name=f"lc{i}_{j}",
            )
        )
    return obj


def _packed(obj):
    co = obj.compile()
    values = obj.default_values()
    b = co.resolve_batch_size(values)
    return co, co.pack(values, b), co.build_aux(values, b)


def test_gbp_delta_matches_dense_gn_on_tree():
    obj, _, _ = _chain(n=6)
    co, state, aux = _packed(obj)

    from theseus_tpu.optim.normal import DenseNormalBuilder

    dense = DenseNormalBuilder(co).build(state, aux)
    d_dense, _ = dense.solve(0.0, False)

    # tree diameter < 12 sweeps; tiny ridge -> exact
    bld = GBPNormalBuilder(co, msg_iters=12, msg_damping=0.0, ridge=1e-12)
    d_gbp, fail = bld.build(state, aux).solve(0.0, False)
    assert not bool(jnp.any(fail))
    np.testing.assert_allclose(
        np.asarray(d_gbp), np.asarray(d_dense), rtol=1e-6, atol=1e-8
    )


def test_gbp_atb_diag_quad_match_dense():
    obj, _, _ = _chain(n=4)
    co, state, aux = _packed(obj)

    from theseus_tpu.optim.normal import DenseNormalBuilder

    dense = DenseNormalBuilder(co).build(state, aux)
    ns = GBPNormalBuilder(co, msg_iters=8, ridge=1e-12).build(state, aux)
    np.testing.assert_allclose(
        np.asarray(ns.Atb), np.asarray(dense.Atb), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ns.diag()), np.asarray(dense.diag()), rtol=1e-6, atol=1e-9
    )
    v = jnp.asarray(
        np.random.default_rng(0).normal(size=np.asarray(ns.Atb).shape)
    )
    np.testing.assert_allclose(
        np.asarray(ns.quad(v)), np.asarray(dense.quad(v)), rtol=1e-6
    )


def test_gbp_optimizer_converges_loopy():
    obj = _loopy(n=8)
    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=15, msg_iters=40, msg_damping=0.4
    )
    out, info = gbp.optimize()
    gn = tt.GaussNewton(obj, max_iterations=15)
    out_gn, _ = gn.optimize()
    for n in obj.optim_vars:
        np.testing.assert_allclose(
            np.asarray(out[n]), np.asarray(out_gn[n]), atol=5e-5
        )
    assert bool(jnp.all(info.last_err < 1e-6))


def test_gbp_layer_backward_modes():
    """Differentiate the GBP layer wrt a tangent perturbation of a
    measurement (on-manifold directions; raw-coordinate gradients differ
    between modes only in the arbitrary off-manifold extension)."""
    obj, _, _ = _chain(n=4, batch=1)
    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=8, msg_iters=10, msg_damping=0.0
    )
    layer = tt.TheseusLayer(gbp)
    values = obj.default_values()
    base = jnp.asarray(values["m0"])
    t0 = jnp.zeros((1, 3))

    grads = {}
    for mode in ("unroll", "implicit", "truncated"):
        def loss(t):
            v = dict(values)
            v["m0"] = se2.compose(base, se2.exp(t))
            out, _ = layer.forward(v, {"backward_mode": mode})
            return jnp.sum(out["x1"] ** 2)

        grads[mode] = np.asarray(jax.grad(loss)(t0))
        assert np.isfinite(grads[mode]).all()
        assert np.abs(grads[mode]).sum() > 1e-3
    np.testing.assert_allclose(
        grads["implicit"], grads["unroll"], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        grads["truncated"], grads["unroll"], rtol=1e-4, atol=1e-6
    )


def test_gbp_marginals_exact_on_tree():
    obj, _, _ = _chain(n=5)
    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=10, msg_iters=12, msg_damping=0.0, gbp_ridge=1e-12
    )
    margs = gbp.marginals()
    out, _ = gbp.optimize()

    # oracle: dense AtA at the solution; marginal precision = inverse of
    # the variable's block of AtA^{-1}
    co = obj.compile()
    b = co.resolve_batch_size(out)
    state, aux = co.pack(out, b), co.build_aux(out, b)
    from theseus_tpu.optim.normal import DenseNormalBuilder

    dense = DenseNormalBuilder(co).build(state, aux)
    cov = np.linalg.inv(np.asarray(dense.AtA))  # (B, D, D)
    off = 0
    for name in co.var_names:
        dv = co.var_groups[name].dof
        blk = cov[:, off : off + dv, off : off + dv]
        lam_expected = np.linalg.inv(blk)
        got = np.asarray(margs[name].precision)
        np.testing.assert_allclose(got, lam_expected, rtol=1e-4, atol=1e-6)
        off += dv


def test_gbp_rejects_duplicate_var_costs():
    obj, _, poses = _chain(n=3)
    obj.add(
        tt.Between(
            poses[0], poses[0], tt.SE2(name="self_m"),
            tt.ScaleCostWeight(1.0), name="self_loop",
        )
    )
    with pytest.raises(ValueError, match="same variable"):
        GBPNormalBuilder(obj.compile())


def test_gbp_per_call_msg_iters_override():
    """forward(optimizer_kwargs={"msg_iters": ...}) must actually change
    the message schedule (regression: the builder's defaults used to win)."""
    obj, _, _ = _chain(n=5, batch=1)
    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=6, msg_iters=1, msg_damping=0.0
    )
    layer = tt.TheseusLayer(gbp)
    _, info_weak = layer.forward(obj.default_values())
    _, info_strong = layer.forward(
        obj.default_values(), {"msg_iters": 30}
    )
    assert float(jnp.max(info_strong.last_err)) < 1e-8
    assert float(jnp.max(info_strong.last_err)) < 0.01 * float(
        jnp.max(info_weak.last_err)
    )
