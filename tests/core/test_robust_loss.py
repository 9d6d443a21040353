"""Robust loss kernels + RobustCostFunction contracts, parametrized over all
four losses (the reference's test_robust_cost.py axes: weighted error carries
the loss value, the linearize factor is the analytic derivative drho/dx,
jacobians are the sqrt(rho')-rescaled base jacobians, flatten_dims applies
the loss per residual dimension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.core.robust_loss import (
    GemanMcClureLoss, HingeLoss, HuberLoss, WelschLoss)

LOSSES = [WelschLoss, HuberLoss, HingeLoss, GemanMcClureLoss]


@pytest.mark.parametrize("loss_cls", LOSSES)
def test_linearize_is_derivative_of_evaluate(loss_cls):
    """The IRLS contract: linearize(x) == d evaluate / dx (reference
    test_robust_cost.py::test_robust_cost_grad_form)."""
    log_radius = jnp.asarray(0.3)
    xs = jnp.asarray([1e-3, 0.1, 0.5, 1.0, 2.0, 10.0, 100.0])
    g = jax.vmap(jax.grad(lambda x: loss_cls.evaluate(x, log_radius)))(xs)
    lin = jax.vmap(lambda x: loss_cls.linearize(x, log_radius))(xs)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(g), rtol=1e-4,
                               atol=1e-6)


@pytest.mark.parametrize("loss_cls", LOSSES)
def test_loss_limits(loss_cls):
    """rho(0)≈0; Welsch/GemanMcClure saturate, Huber grows sub-linearly."""
    log_radius = jnp.asarray(0.0)  # radius = 1
    z = float(loss_cls.evaluate(jnp.asarray(0.0), log_radius))
    assert abs(z) < 1e-6
    big = float(loss_cls.evaluate(jnp.asarray(1e4), log_radius))
    if loss_cls in (WelschLoss, GemanMcClureLoss):
        assert big <= 1.0 + 1e-5  # saturates at radius (mu*radius)
    else:
        assert big < 1e4  # sub-quadratic growth in ||we||^2


def _robust_problem(loss_cls, flatten_dims, batch=3, radius=0.5):
    x = tt.Vector(tensor=jnp.zeros((batch, 2)), name="x")
    t = tt.Vector(
        tensor=jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, 2)), jnp.float64
        ),
        name="t",
    )
    base = tt.Local(x, t, tt.ScaleCostWeight(2.0), name="base")
    robust = tt.RobustCostFunction(
        base, loss_cls, np.log(radius), flatten_dims=flatten_dims,
        name="rob",
    )
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(robust)
    return obj, robust, base


@pytest.mark.parametrize("loss_cls", LOSSES)
@pytest.mark.parametrize("flatten_dims", [False, True])
def test_robust_weighted_error_carries_loss_value(loss_cls, flatten_dims):
    """sum(robust_error^2) per cost == rho(||w e||^2) (whole-cost mode) or
    sum_i rho((w e)_i^2) (flatten_dims), reference test_robust_cost
    _weighted_error."""
    obj, robust, base = _robust_problem(loss_cls, flatten_dims)
    e = obj.error()  # (B, dim)
    got = np.sum(np.asarray(e) ** 2, axis=-1)

    # oracle from raw residuals
    values = obj.default_values()
    werr = 2.0 * (values["x"] - np.asarray(values["t"]))  # weight*(x-t)
    lr = jnp.log(0.5)
    if flatten_dims:
        want = np.sum(
            np.asarray(loss_cls.evaluate(jnp.asarray(werr**2), lr)), axis=-1
        )
    else:
        want = np.asarray(
            jax.vmap(lambda s: loss_cls.evaluate(s, lr))(
                jnp.sum(jnp.asarray(werr**2), axis=-1)
            )
        )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("loss_cls", LOSSES)
def test_robust_equals_plain_at_large_radius(loss_cls):
    """radius -> inf: rho(x) -> x (mu*radius for GNC), so the robust solve
    matches the unwrapped least-squares solve."""
    if loss_cls is HingeLoss:
        pytest.skip("hinge is identically 0 below the radius by design")
    obj, _, _ = _robust_problem(loss_cls, False, radius=1e8)
    opt = tt.GaussNewton(obj, max_iterations=10)
    out, _ = opt.optimize()
    np.testing.assert_allclose(
        np.asarray(out["x"]), np.asarray(obj.default_values()["t"]),
        atol=1e-6,
    )


@pytest.mark.parametrize("loss_cls", [WelschLoss, GemanMcClureLoss])
def test_robust_downweights_outliers(loss_cls):
    """A far-off target contributes ~zero gradient: the solve sticks near
    the inlier target instead of the average."""
    batch = 1
    x = tt.Vector(tensor=jnp.zeros((batch, 2)), name="x")
    t_in = tt.Vector(tensor=jnp.full((batch, 2), 0.1), name="t_in")
    t_out = tt.Vector(tensor=jnp.full((batch, 2), 100.0), name="t_out")
    w = tt.ScaleCostWeight(1.0)
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(tt.Local(x, t_in, w, name="inlier"))
    obj.add(
        tt.RobustCostFunction(
            tt.Local(x, t_out, w, name="outlier"), loss_cls,
            np.log(0.5), name="rob_out",
        )
    )
    out, _ = tt.LevenbergMarquardt(
        obj, max_iterations=20, adaptive_damping=True
    ).optimize()
    assert float(jnp.max(jnp.abs(out["x"] - 0.1))) < 1e-2
