"""Trace-time vectorizer contracts (reference core/test_vectorizer.py):
schema bucketing groups equal-schema costs, shared variables become shared
slots, AutoDiff costs bucket per error-fn identity, and the vectorized
error/retract match the per-cost reference computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.lie import se2


def _between_chain(n=5, batch=2, dtype=jnp.float64):
    rng = np.random.default_rng(0)
    poses = [
        tt.SE2(
            tensor=se2.exp(jnp.asarray(rng.normal(size=(batch, 3)), dtype)),
            name=f"x{i}",
        )
        for i in range(n)
    ]
    obj = tt.Objective(dtype=dtype)
    for i in range(n - 1):
        m = tt.SE2(
            tensor=se2.exp(jnp.asarray(rng.normal(size=(batch, 3)), dtype)),
            name=f"m{i}",
        )
        obj.add(tt.Between(poses[i], poses[i + 1], m,
                           tt.ScaleCostWeight(1.5), name=f"c{i}"))
    return obj, poses


def test_equal_schema_costs_fuse_into_one_bucket():
    obj, _ = _between_chain(n=6)
    co = obj.compile()
    assert len(co.buckets) == 1
    assert co.buckets[0].k == 5


def test_different_weights_split_buckets():
    obj, poses = _between_chain(n=3)
    # a Diagonal-weighted Between has a different weight schema
    obj.add(
        tt.Between(
            poses[0], poses[2],
            tt.SE2(tensor=poses[0].tensor, name="m_d"),
            tt.DiagonalCostWeight(jnp.ones((1, 3))), name="c_diag",
        )
    )
    co = obj.compile()
    assert len(co.buckets) == 2


def test_shared_variable_detected_as_shared_slot():
    """All costs anchored to the SAME target variable -> shared aux slot
    (reference test_correct_schemas_and_shared_vars)."""
    t = tt.Vector(tensor=jnp.ones((1, 2)), name="t_shared")
    obj = tt.Objective()
    for i in range(4):
        x = tt.Vector(tensor=jnp.zeros((1, 2)), name=f"x{i}")
        obj.add(tt.Local(x, t, tt.ScaleCostWeight(1.0), name=f"c{i}"))
    co = obj.compile()
    (bk,) = co.buckets
    assert any(s.shared for s in bk.aux_slots)


def test_autodiff_costs_bucket_per_fn_identity():
    """Two AutoDiffCostFunctions with different err fns must NOT fuse
    (reference test_correct_schemas_for_autodiffcosts)."""

    def err_a(optim, aux):
        (x,) = optim
        return x - 1.0

    def err_b(optim, aux):
        (x,) = optim
        return 2.0 * x

    obj = tt.Objective()
    for i, fn in enumerate([err_a, err_a, err_b]):
        x = tt.Vector(tensor=jnp.zeros((1, 2)), name=f"x{i}")
        obj.add(
            tt.AutoDiffCostFunction(
                [x], 2, fn, cost_weight=tt.ScaleCostWeight(1.0),
                name=f"c{i}",
            )
        )
    co = obj.compile()
    assert len(co.buckets) == 2
    assert sorted(bk.k for bk in co.buckets) == [1, 2]


def test_vectorized_error_matches_per_cost():
    """Bucketed evaluation == unvectorized (one bucket per cost) evaluation
    (reference test_vectorized_error)."""
    obj, _ = _between_chain(n=6)
    e_vec = np.asarray(obj.error())
    co_off = obj.compile(vectorize=False)
    values = obj.default_values()
    b = co_off.resolve_batch_size(values)
    e_off = np.asarray(co_off.error(co_off.pack(values, b),
                                    co_off.build_aux(values, b)))
    np.testing.assert_allclose(e_vec, e_off, rtol=1e-12, atol=1e-12)
    # default-path compile() honors the explicit vectorize=False choice (the
    # optimizer calls compile() internally on state packed for THIS schema)
    # but warns so the regression is never silent; explicit True switches back
    with pytest.warns(UserWarning, match="vectorize=False"):
        assert not obj.compile()._vectorized
    assert obj.compile(vectorize=True)._vectorized
    assert obj.compile()._vectorized


def test_retract_matches_manual_group_retract():
    obj, poses = _between_chain(n=3)
    co = obj.compile()
    values = obj.default_values()
    b = co.resolve_batch_size(values)
    state = co.pack(values, b)
    delta = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, co.total_dof)), jnp.float64
    )
    new_state = co.retract(state, delta)
    out = co.unpack(new_state)
    # manual: each pose retracts by its tangent slice, in var order
    off = 0
    for name in co.var_names:
        g = co.var_groups[name]
        want = g.retract(values[name], delta[:, off : off + g.dof])
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(want), rtol=1e-12, atol=1e-12
        )
        off += g.dof
