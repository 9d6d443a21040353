"""End-to-end dense-path tests: quadratic curve fit (the reference's
simple_example.py / test_theseus_layer.py:83 pattern) across optimizers and
backward modes, with gradients checked against finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def make_data(batch=4, npts=30, seed=0):
    """y = a x^2 + b with per-batch (a, b)."""
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, size=(batch, npts))
    ab = rng.uniform(0.5, 2.0, size=(batch, 2))
    y = ab[:, :1] * x**2 + ab[:, 1:]
    return (
        jnp.asarray(x, jnp.float64),
        jnp.asarray(y, jnp.float64),
        jnp.asarray(ab, jnp.float64),
    )


def build_problem(npts=30):
    v = tt.Vector(2, name="ab")
    x = tt.Variable(jnp.zeros((1, npts)), name="x")
    y = tt.Variable(jnp.zeros((1, npts)), name="y")

    def err_fn(optim, aux):
        (ab,) = optim
        x, y = aux
        return y - (ab[0] * x**2 + ab[1])

    cost = tt.AutoDiffCostFunction([v], npts, err_fn, aux_vars=[x, y], name="fit")
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(cost)
    return obj


@pytest.mark.parametrize("optimizer_cls", [tt.GaussNewton, tt.LevenbergMarquardt])
def test_curve_fit_converges(optimizer_cls):
    x, y, ab_true = make_data()
    obj = build_problem()
    opt = optimizer_cls(obj, max_iterations=15)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(
        {"x": x, "y": y, "ab": jnp.zeros((4, 2), jnp.float64)}
    )
    np.testing.assert_allclose(values["ab"], ab_true, atol=1e-6)
    assert np.all(np.asarray(info.status) == tt.NonlinearOptimizerStatus.CONVERGED)
    assert np.all(np.asarray(info.converged_iter) >= 1)


def test_lm_adaptive_damping_converges():
    x, y, ab_true = make_data()
    obj = build_problem()
    opt = tt.LevenbergMarquardt(obj, max_iterations=25, adaptive_damping=True)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(
        {"x": x, "y": y, "ab": jnp.zeros((4, 2), jnp.float64)}
    )
    np.testing.assert_allclose(values["ab"], ab_true, atol=1e-6)


def test_objective_error_api():
    x, y, ab_true = make_data()
    obj = build_problem()
    e = obj.error(input_tensors={"x": x, "y": y, "ab": ab_true})
    assert e.shape == (4, 30)
    np.testing.assert_allclose(e, 0.0, atol=1e-12)
    m = obj.error_metric(input_tensors={"x": x, "y": y, "ab": jnp.zeros((4, 2))})
    assert m.shape == (4,)
    assert np.all(np.asarray(m) > 0)


def _outer_loss_fn(mode, noisy=False):
    """Builds f(theta) = outer loss after inner solve, for gradient checks.

    theta scales the y data (an aux input), so gradients must flow through
    the inner optimization."""
    x, y, ab_true = make_data(batch=2, npts=10)
    obj = build_problem(npts=10)
    opt = tt.GaussNewton(obj, max_iterations=8)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()

    def f(theta):
        values = obj.default_values(
            {"x": x, "y": theta * y, "ab": jnp.zeros((2, 2), jnp.float64)}
        )
        state = co.pack(values, 2)
        aux = co.build_aux(values, 2)
        carry = layer.solve_state(state, aux, mode, opt.opts, 3)
        sol = co.unpack(carry["state"])
        return jnp.sum(sol["ab"] ** 2)

    return f


@pytest.mark.parametrize("mode", ["unroll", "implicit", "truncated", "dlm"])
def test_backward_modes_match_fd(mode):
    f = _outer_loss_fn(mode)
    theta = jnp.asarray(1.3, jnp.float64)
    g = jax.grad(f)(theta)
    h = 1e-5
    fd = (f(theta + h) - f(theta - h)) / (2 * h)
    # round-3: central-difference DLM with cotangent normalization sits at
    # FD-roundoff accuracy on this problem (measured 6e-12); same contract
    # as the exact modes
    tol = 1e-5
    np.testing.assert_allclose(g, fd, rtol=tol, atol=tol)


def test_batch_broadcast_and_masking():
    """Batch-1 inputs broadcast to the resolved batch size."""
    x, y, ab_true = make_data(batch=3)
    obj = build_problem()
    opt = tt.GaussNewton(obj, max_iterations=10)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(
        {"x": x[:1], "y": y, "ab": jnp.zeros((1, 2), jnp.float64)}
    )
    assert values["ab"].shape == (3, 2)


def test_scale_cost_weight_learnable():
    """A learnable scalar weight participates in outer gradients."""
    x, y, _ = make_data(batch=2, npts=10)
    v = tt.Vector(2, name="ab")
    xv = tt.Variable(x, name="x")
    yv = tt.Variable(y, name="y")
    w = tt.ScaleCostWeight(2.0, name="w")

    def err_fn(optim, aux):
        (ab,) = optim
        xx, yy = aux
        return yy - (ab[0] * xx**2 + ab[1])

    cost = tt.AutoDiffCostFunction([v], 10, err_fn, aux_vars=[xv, yv], cost_weight=w)
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(cost)
    e1 = obj.error(input_tensors={"ab": jnp.zeros((2, 2))})
    e2 = obj.error(input_tensors={"ab": jnp.zeros((2, 2)), w.scale.name: jnp.asarray([[4.0]])})
    np.testing.assert_allclose(2 * np.asarray(e1), np.asarray(e2), atol=1e-12)


def test_robust_cost_function_huber():
    x, y, ab_true = make_data(batch=2, npts=12)
    # inject outliers
    y = y.at[:, 0].add(50.0)
    v = tt.Vector(2, name="ab")
    xv = tt.Variable(x, name="x")
    yv = tt.Variable(y, name="y")

    def err_fn(optim, aux):
        (ab,) = optim
        xx, yy = aux
        return yy - (ab[0] * xx**2 + ab[1])

    base = tt.AutoDiffCostFunction([v], 12, err_fn, aux_vars=[xv, yv])
    robust = tt.RobustCostFunction(
        base, tt.HuberLoss, jnp.log(jnp.asarray([[0.5]], jnp.float64)),
        flatten_dims=True, name="rfit",
    )
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(robust)
    opt = tt.LevenbergMarquardt(obj, max_iterations=30, adaptive_damping=True)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward({"ab": jnp.zeros((2, 2), jnp.float64)})
    # robust fit should be much closer to the inlier model than LS fit
    assert np.abs(np.asarray(values["ab"]) - np.asarray(ab_true)).max() < 0.5
