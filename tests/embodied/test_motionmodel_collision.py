"""Tests for motion-model and collision costs: analytic-vs-autodiff
jacobians, SDF lookups, GP weight correctness, and a GP motion-planning
mini-problem (the reference motion_planning_2d structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.embodied import (
    Collision2D,
    DoubleIntegrator,
    EffectorObjectContactPlanar,
    GPCostWeight,
    GPMotionModel,
    HingeCost,
    Nonholonomic,
    QuasiStaticPushingPlanar,
    occupancy_to_sdf,
    sdf_signed_distance,
)


def autodiff_jacs(cf, optim, aux):
    saved = cf.__class__.has_analytic_jacobians
    cf.__class__.has_analytic_jacobians = False
    try:
        return cf.jacobians_fn()(optim, aux)
    finally:
        cf.__class__.has_analytic_jacobians = saved


def check_analytic(cf, optim, aux, atol=1e-9):
    jacs_a, err_a = cf.jacobians_impl(optim, aux)
    jacs_n, err_n = autodiff_jacs(cf, optim, aux)
    np.testing.assert_allclose(err_a, err_n, atol=1e-12)
    for ja, jn in zip(jacs_a, jacs_n):
        np.testing.assert_allclose(ja, jn, atol=atol)


def test_double_integrator_jacobians_se2():
    p1, p2 = tt.SE2(name="p1"), tt.SE2(name="p2")
    v1, v2 = tt.Vector(3, name="v1"), tt.Vector(3, name="v2")
    cf = DoubleIntegrator(p1, v1, p2, v2, 0.1)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    g = p1.group
    optim = (
        g.rand(keys[0], dtype=jnp.float64),
        jax.random.normal(keys[1], (3,), dtype=jnp.float64),
        g.rand(keys[2], dtype=jnp.float64),
        jax.random.normal(keys[3], (3,), dtype=jnp.float64),
    )
    aux = (jnp.asarray([0.1], jnp.float64),)
    check_analytic(cf, optim, aux)


def test_gp_cost_weight():
    dof = 3
    qc_inv = jnp.eye(dof, dtype=jnp.float64) * 2.0
    w = GPCostWeight(qc_inv, 0.5)
    err = jax.random.normal(jax.random.PRNGKey(1), (2 * dof,), dtype=jnp.float64)
    werr, _ = w.apply(err, None, (qc_inv, jnp.asarray([0.5], jnp.float64)))
    # ||W e||^2 must equal e^T Q e with the GPMP2 Q assembly
    dt = 0.5
    q11 = 12.0 * dt**-3 * qc_inv
    q12 = -6.0 * dt**-2 * qc_inv
    q22 = 4.0 / dt * qc_inv
    Q = np.block([[np.asarray(q11), np.asarray(q12)], [np.asarray(q12), np.asarray(q22)]])
    np.testing.assert_allclose(
        np.sum(np.asarray(werr) ** 2), np.asarray(err) @ Q @ np.asarray(err), rtol=1e-10
    )


def test_hinge_cost():
    v = tt.Vector(3, name="v")
    cf = HingeCost(v, -1.0, 1.0, 0.1)
    aux = tuple(a.tensor[0] for a in cf.aux_vars)
    x = jnp.asarray([-2.0, 0.0, 1.5], jnp.float64)
    err = cf.error_impl((x,), aux)
    np.testing.assert_allclose(err, [1.1, 0.0, 0.6], atol=1e-12)
    check_analytic(cf, (x,), aux)


def test_nonholonomic():
    for pose_var in (tt.SE2(name="pse2"), tt.Vector(3, name="pvec")):
        vel = tt.Vector(3, name=f"vel_{pose_var.name}")
        cf = Nonholonomic(pose_var, vel, name=f"nh_{pose_var.name}")
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        pose = pose_var.group.rand(k1, dtype=jnp.float64)
        v = jax.random.normal(k2, (3,), dtype=jnp.float64)
        check_analytic(cf, (pose, v), ())


def test_sdf_lookup_and_gradients():
    # circular obstacle occupancy -> SDF
    h = w = 20
    occ = np.zeros((h, w))
    yy, xx = np.mgrid[0:h, 0:w]
    occ[(yy - 10) ** 2 + (xx - 10) ** 2 < 9] = 1.0
    cell = 0.1
    sdf = occupancy_to_sdf(occ, cell)
    origin = jnp.asarray([0.0, 0.0])
    data = jnp.asarray(sdf)
    cs = jnp.asarray([cell])
    # center of obstacle: negative; far corner: positive
    d_center, oob = sdf_signed_distance(data, origin, cs, jnp.asarray([1.0, 1.0]))
    assert not bool(oob) and float(d_center) < 0
    d_corner, _ = sdf_signed_distance(data, origin, cs, jnp.asarray([0.1, 0.1]))
    assert float(d_corner) > 0
    # out of bounds -> boundary value 0
    d_oob, oob2 = sdf_signed_distance(data, origin, cs, jnp.asarray([5.0, 5.0]))
    assert bool(oob2) and float(d_oob) == 0.0
    # differentiable
    g = jax.grad(lambda p: sdf_signed_distance(data, origin, cs, p)[0])(
        jnp.asarray([1.0, 0.7])
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_collision2d_cost():
    occ = np.zeros((16, 16))
    occ[6:10, 6:10] = 1.0
    sdf = occupancy_to_sdf(occ, 0.1)
    pose = tt.Point2(name="p")
    cf = Collision2D(pose, jnp.zeros(2), jnp.asarray(sdf), 0.1, cost_eps=0.3)
    aux = tuple(
        (a.tensor[0] if a.tensor.ndim > 2 or a.tensor.shape[0] == 1 else a.tensor[0])
        for a in cf.aux_vars
    )
    aux = (jnp.zeros(2), jnp.asarray(sdf), jnp.asarray([0.1]), jnp.asarray([0.3]))
    err_in = cf.error_impl((jnp.asarray([0.8, 0.8]),), aux)
    err_out = cf.error_impl((jnp.asarray([0.1, 0.1]),), aux)
    assert float(err_in[0]) > float(err_out[0])
    assert float(err_out[0]) == 0.0


def test_quasi_static_pushing_zero_motion():
    """No motion => residual 0 (D V = Vp = 0)."""
    obj1, obj2 = tt.SE2(name="o1"), tt.SE2(name="o2")
    eff1, eff2 = tt.SE2(name="e1"), tt.SE2(name="e2")
    cf = QuasiStaticPushingPlanar(obj1, obj2, eff1, eff2, c_square=1.0)
    g = obj1.group
    o = g.rand(jax.random.PRNGKey(3), dtype=jnp.float64)
    e = g.rand(jax.random.PRNGKey(4), dtype=jnp.float64)
    err = cf.error_impl((o, o, e, e), (jnp.asarray([1.0], jnp.float64),))
    np.testing.assert_allclose(err, 0.0, atol=1e-12)
    # autodiff jacobians are finite
    jacs, _ = cf.jacobians_fn()((o, o, e, e), (jnp.asarray([1.0], jnp.float64),))
    for j in jacs:
        assert np.all(np.isfinite(np.asarray(j)))


def test_gp_motion_planning_problem():
    """Straight-line trajectory optimization with GP priors + boundary costs
    (motion_planning_2d structure, reference utils/examples/motion_planning)."""
    n_steps = 8
    dt = 0.2
    dtype = jnp.float64
    obj = tt.Objective(dtype=dtype)
    qc_inv = jnp.eye(2, dtype=dtype)
    start = jnp.asarray([[0.0, 0.0]], dtype)
    goal = jnp.asarray([[1.0, 1.0]], dtype)

    poses = [tt.Point2(name=f"pose_{i}") for i in range(n_steps)]
    vels = [tt.Vector(2, name=f"vel_{i}") for i in range(n_steps)]
    bw = tt.ScaleCostWeight(jnp.asarray(100.0, dtype))
    obj.add(tt.Local(poses[0], start, bw, name="start"))
    obj.add(tt.Local(poses[-1], goal, bw, name="goal"))
    obj.add(tt.Local(vels[0], jnp.zeros((1, 2), dtype), bw, name="v0"))
    obj.add(tt.Local(vels[-1], jnp.zeros((1, 2), dtype), bw, name="vT"))
    for i in range(n_steps - 1):
        w = GPCostWeight(qc_inv, dt, name=f"gpw_{i}")
        obj.add(GPMotionModel(poses[i], vels[i], poses[i + 1], vels[i + 1], dt, w,
                              name=f"gp_{i}"))

    init = {f"pose_{i}": jnp.zeros((1, 2), dtype) for i in range(n_steps)}
    init.update({f"vel_{i}": jnp.zeros((1, 2), dtype) for i in range(n_steps)})
    opt = tt.GaussNewton(obj, max_iterations=10)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(init)
    assert np.all(np.asarray(info.status) == tt.NonlinearOptimizerStatus.CONVERGED)
    # trajectory endpoints match, interior interpolates monotonically
    np.testing.assert_allclose(values["pose_0"], start, atol=1e-3)
    np.testing.assert_allclose(values[f"pose_{n_steps-1}"], goal, atol=1e-3)
    mid = np.asarray(values[f"pose_{n_steps//2}"])
    assert 0.2 < mid[0, 0] < 0.8
