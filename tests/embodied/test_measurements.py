"""Embodied cost tests: analytic jacobians vs the autodiff path, and a mini
SE3 pose-graph solved by GN/LM/Dogleg on the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu import lie
from theseus_tpu.embodied import Between, Local, MovingFrameBetween


def autodiff_jacs(cf, optim, aux):
    """Ground-truth jacobians via jacfwd through retract (the fallback path)."""
    saved = cf.__class__.has_analytic_jacobians
    cf.__class__.has_analytic_jacobians = False
    try:
        jfn = cf.jacobians_fn()
        return jfn(optim, aux)
    finally:
        cf.__class__.has_analytic_jacobians = saved


GROUPS = [tt.SO2, tt.SE2, tt.SO3, tt.SE3]


@pytest.mark.parametrize("ctor", GROUPS, ids=[c.__name__ for c in GROUPS])
def test_between_analytic_matches_autodiff(ctor):
    v1, v2 = ctor(name="a"), ctor(name="b")
    cf = Between(v1, v2, ctor(name="m").group.rand(jax.random.PRNGKey(0), dtype=jnp.float64))
    g = v1.group
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    optim = (g.rand(k1, dtype=jnp.float64), g.rand(k2, dtype=jnp.float64))
    aux = (g.rand(jax.random.PRNGKey(2), dtype=jnp.float64),)
    jacs_a, err_a = cf.jacobians_impl(optim, aux)
    jacs_n, err_n = autodiff_jacs(cf, optim, aux)
    np.testing.assert_allclose(err_a, err_n, atol=1e-12)
    for ja, jn in zip(jacs_a, jacs_n):
        np.testing.assert_allclose(ja, jn, atol=1e-9)


@pytest.mark.parametrize("ctor", GROUPS, ids=[c.__name__ for c in GROUPS])
def test_local_analytic_matches_autodiff(ctor):
    var = ctor(name="v")
    g = var.group
    cf = Local(var, g.rand(jax.random.PRNGKey(3), dtype=jnp.float64))
    optim = (g.rand(jax.random.PRNGKey(4), dtype=jnp.float64),)
    aux = (g.rand(jax.random.PRNGKey(5), dtype=jnp.float64),)
    jacs_a, err_a = cf.jacobians_impl(optim, aux)
    jacs_n, err_n = autodiff_jacs(cf, optim, aux)
    np.testing.assert_allclose(err_a, err_n, atol=1e-12)
    np.testing.assert_allclose(jacs_a[0], jacs_n[0], atol=1e-9)


def test_moving_frame_between_jacobians():
    f1, f2 = tt.SE2(name="f1"), tt.SE2(name="f2")
    p1, p2 = tt.SE2(name="p1"), tt.SE2(name="p2")
    g = f1.group
    keys = jax.random.split(jax.random.PRNGKey(6), 5)
    cf = MovingFrameBetween(f1, f2, p1, p2, g.rand(keys[4], dtype=jnp.float64))
    optim = tuple(g.rand(k, dtype=jnp.float64) for k in keys[:4])
    aux = (g.rand(jax.random.PRNGKey(7), dtype=jnp.float64),)
    jacs_a, err_a = cf.jacobians_impl(optim, aux)
    jacs_n, err_n = autodiff_jacs(cf, optim, aux)
    np.testing.assert_allclose(err_a, err_n, atol=1e-12)
    for ja, jn in zip(jacs_a, jacs_n):
        np.testing.assert_allclose(ja, jn, atol=1e-9)


def make_pgo(n_poses=6, batch=2, noise=0.05, seed=0):
    """Mini SE3 pose graph: chain odometry + loop closure + prior on pose 0."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, n_poses * 3)
    g = lie.SE3
    gt = [g.identity(batch, dtype=jnp.float64)]
    for i in range(1, n_poses):
        step = g.exp(0.4 * jax.random.normal(keys[i], (batch, 6), dtype=jnp.float64))
        gt.append(jax.vmap(g.compose)(gt[-1], step))

    obj = tt.Objective(dtype=jnp.float64)
    poses = [tt.SE3(name=f"pose_{i}") for i in range(n_poses)]
    obj.add(Local(poses[0], gt[0], tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64)), name="prior"))
    meas = {}
    edges = [(i, i + 1) for i in range(n_poses - 1)] + [(n_poses - 1, 0), (0, n_poses // 2)]
    for ei, (i, j) in enumerate(edges):
        rel = jax.vmap(g.compose)(jax.vmap(g.inverse)(gt[i]), gt[j])
        nz = g.exp(noise * jax.random.normal(keys[n_poses + ei], (batch, 6), dtype=jnp.float64))
        rel_noisy = jax.vmap(g.compose)(rel, nz)
        obj.add(Between(poses[i], poses[j], rel_noisy, name=f"edge_{ei}"))
    # noisy init
    init = {
        f"pose_{i}": jax.vmap(g.compose)(
            gt[i], g.exp(0.2 * jax.random.normal(keys[2 * n_poses + i], (batch, 6), dtype=jnp.float64))
        )
        for i in range(n_poses)
    }
    return obj, init, gt


@pytest.mark.parametrize("opt_cls,kw", [
    (tt.GaussNewton, {}),
    (tt.LevenbergMarquardt, {"adaptive_damping": True}),
    (tt.Dogleg, {}),
])
def test_mini_pgo_converges(opt_cls, kw):
    obj, init, gt = make_pgo()
    opt = opt_cls(obj, max_iterations=30, **kw)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(init)
    final_err = np.asarray(obj.error_metric(values=values))
    init_err = np.asarray(obj.error_metric(values={**obj.default_values(init)}))
    assert np.all(final_err < 0.02 * init_err)
    # recovered pose_1 close to ground truth (up to measurement noise)
    d = lie.SE3.local(values["pose_1"], gt[1])
    assert np.abs(np.asarray(d)).max() < 0.2
