"""Zero-weight cost skipping (reference CostWeight.is_zero +
masked_jacobians, theseus/core/cost_weight.py:29, cost_function.py:37,104-121):
batch elements whose weight is exactly zero must contribute exactly 0 to the
linearization even when their unweighted residual is NaN/inf."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def test_is_zero_masks():
    s = tt.ScaleCostWeight(jnp.array([1.0, 0.0, 2.0]))
    z = s.is_zero(tuple(v.tensor for v in s.aux_vars))
    np.testing.assert_array_equal(np.asarray(z), [False, True, False])

    d = tt.DiagonalCostWeight(jnp.array([[1.0, 0.0], [0.0, 0.0]]))
    z = d.is_zero(tuple(v.tensor for v in d.aux_vars))
    np.testing.assert_array_equal(np.asarray(z), [False, True])


def test_zero_weight_nan_residual_does_not_poison_solve():
    """Half the batch has weight 0 and a NaN target on one cost; the solve
    must still converge (to the other cost's target) with finite values."""
    batch, dim = 4, 3
    rng = np.random.RandomState(0)
    t_good = jnp.asarray(rng.uniform(-1, 1, size=(batch, dim)))
    # NaN targets exactly where the weight is zero
    w = jnp.array([1.0, 0.0, 1.0, 0.0])
    t_bad = jnp.where(w[:, None] == 0, jnp.nan, 2.0 * t_good)

    x = tt.Vector(dim, name="x")
    va = tt.Variable(t_good, name="t_good")
    vb = tt.Variable(t_bad, name="t_bad")

    def err_fn(optim, aux):
        (xx,) = optim
        (t,) = aux
        return xx - t

    obj = tt.Objective(dtype=jnp.float64)
    obj.add(tt.AutoDiffCostFunction([x], dim, err_fn, aux_vars=[va],
                                    name="good"))
    obj.add(tt.AutoDiffCostFunction([x], dim, err_fn, aux_vars=[vb],
                                    cost_weight=tt.ScaleCostWeight(w),
                                    name="maybe_bad"))
    opt = tt.GaussNewton(obj, max_iterations=10)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward({"x": jnp.zeros((batch, dim), jnp.float64)})
    sol = np.asarray(values["x"])
    assert np.all(np.isfinite(sol[1])) and np.all(np.isfinite(sol[3]))
    # zero-weight elements see only the good cost -> converge to t_good
    np.testing.assert_allclose(sol[1], np.asarray(t_good)[1], atol=1e-8)
    np.testing.assert_allclose(sol[3], np.asarray(t_good)[3], atol=1e-8)
    # nonzero-weight elements balance both costs: x = (t_good + 4*2t_good)/5?
    # (weights 1 and 1: x = (t_good + 2 t_good)/2 in normal equations)
    expected = (np.asarray(t_good) + np.asarray(t_bad)) / 2.0
    np.testing.assert_allclose(sol[0], expected[0], atol=1e-8)
    np.testing.assert_allclose(sol[2], expected[2], atol=1e-8)


def test_zero_weight_matches_erased_cost():
    """With finite residuals, zero-weighting a cost gives the same solution
    as omitting it for those batch elements."""
    batch, dim = 2, 2
    t1 = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    t2 = jnp.asarray([[5.0, 6.0], [7.0, 8.0]])
    w = jnp.array([1.0, 0.0])

    def build(with_second):
        x = tt.Vector(dim, name="x")
        obj = tt.Objective(dtype=jnp.float64)

        def err_fn(optim, aux):
            return optim[0] - aux[0]

        obj.add(tt.AutoDiffCostFunction(
            [x], dim, err_fn, aux_vars=[tt.Variable(t1, name="t1")], name="c1"))
        if with_second:
            obj.add(tt.AutoDiffCostFunction(
                [x], dim, err_fn, aux_vars=[tt.Variable(t2, name="t2")],
                cost_weight=tt.ScaleCostWeight(w), name="c2"))
        opt = tt.GaussNewton(obj, max_iterations=6)
        values, _ = tt.TheseusLayer(opt).forward(
            {"x": jnp.zeros((batch, dim), jnp.float64)})
        return np.asarray(values["x"])

    both = build(True)
    only1 = build(False)
    # batch element 1 has weight 0 on c2 -> identical to the c1-only problem
    np.testing.assert_allclose(both[1], only1[1], atol=1e-10)
    # batch element 0 sees both costs -> midpoint
    np.testing.assert_allclose(both[0], (np.asarray(t1)[0] + np.asarray(t2)[0]) / 2, atol=1e-10)
