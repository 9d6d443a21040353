"""Objective bookkeeping semantics: add/erase variable lifetime, name-clash
rules, compile-cache invalidation, batch-size resolution.

Mirrors the behavioral contract of the reference's core/test_objective.py
(test_add, test_add_and_erase_step_by_step, test_update_raises_batch_size
_error, test_cost_delete_and_add) against this package's builder API."""

import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def _w():
    return tt.ScaleCostWeight(1.0)


def _vec(name, val=0.0, batch=1):
    return tt.Vector(tensor=jnp.full((batch, 2), val), name=name)


def test_add_registers_optim_and_aux():
    obj = tt.Objective()
    x, t = _vec("x"), _vec("t", 1.0)
    obj.add(tt.Local(x, t, _w(), name="c0"))
    assert obj.has_cost_function("c0")
    assert obj.size_cost_functions() == 1
    assert set(obj.optim_vars) == {"x"}
    assert "t" in obj.aux_vars
    assert obj.dim() == 2


def test_duplicate_cost_name_rejected():
    obj = tt.Objective()
    obj.add(tt.Local(_vec("x"), _vec("t"), _w(), name="c0"))
    with pytest.raises(ValueError, match="Duplicate"):
        obj.add(tt.Local(_vec("y"), _vec("t2"), _w(), name="c0"))


def test_optim_name_clash_different_groups_rejected():
    obj = tt.Objective()
    obj.add(tt.Local(_vec("x"), _vec("t"), _w(), name="c0"))
    x_se2 = tt.SE2(name="x")  # same name, different group
    with pytest.raises(ValueError, match="clash"):
        obj.add(tt.Local(x_se2, tt.SE2(name="t_se2"), _w(), name="c1"))


def test_aux_vs_optim_name_collision_rejected():
    obj = tt.Objective()
    obj.add(tt.Local(_vec("x"), _vec("t"), _w(), name="c0"))
    # a new cost tries to use "x" (an optim var) as an aux target
    with pytest.raises(ValueError, match="registered as optimization"):
        obj.add(tt.Local(_vec("y"), _vec("x"), _w(), name="c1"))


def test_erase_keeps_shared_variables():
    """Erasing a cost drops only the variables no other cost references
    (reference test_add_and_erase_step_by_step)."""
    obj = tt.Objective()
    x, y, t = _vec("x"), _vec("y"), _vec("t", 1.0)
    m = _vec("m", 0.5)
    obj.add(tt.Local(x, t, _w(), name="cx"))
    obj.add(tt.Between(x, y, m, _w(), name="cxy"))
    assert set(obj.optim_vars) == {"x", "y"}

    obj.erase("cxy")
    # x still referenced by cx; y and m orphaned
    assert set(obj.optim_vars) == {"x"}
    assert "m" not in obj.aux_vars and "t" in obj.aux_vars
    assert obj.size_cost_functions() == 1

    obj.erase("cx")
    assert obj.size_variables() == 0
    assert obj.size_aux_vars() == 0


def test_erase_then_readd_solves():
    """Delete + re-add with new data reaches the new optimum (reference
    test_cost_delete_and_add)."""
    obj = tt.Objective()
    x = _vec("x")
    obj.add(tt.Local(x, _vec("t", 1.0), _w(), name="c0"))
    opt = tt.GaussNewton(obj, max_iterations=5)
    out, _ = opt.optimize()
    np.testing.assert_allclose(np.asarray(out["x"]), 1.0, atol=1e-8)

    obj.erase("c0")
    obj.add(tt.Local(_vec("x"), _vec("t2", 3.0), _w(), name="c1"))
    opt2 = tt.GaussNewton(obj, max_iterations=5)
    out2, _ = opt2.optimize()
    np.testing.assert_allclose(np.asarray(out2["x"]), 3.0, atol=1e-8)


def test_version_counter_and_compile_cache():
    obj = tt.Objective()
    obj.add(tt.Local(_vec("x"), _vec("t"), _w(), name="c0"))
    v0 = obj.current_version
    co = obj.compile()
    assert obj.compile() is co  # cached
    obj.add(tt.Local(_vec("y"), _vec("t2"), _w(), name="c1"))
    assert obj.current_version == v0 + 1
    assert obj.compile() is not co  # invalidated by structural change


def test_batch_size_resolution_error():
    """Inconsistent batch sizes (neither 1 nor the common B) must raise
    (reference test_update_raises_batch_size_error)."""
    obj = tt.Objective()
    x = tt.Vector(tensor=jnp.zeros((4, 2)), name="x")
    t = tt.Vector(tensor=jnp.ones((3, 2)), name="t")  # 3 != 4, != 1
    obj.add(tt.Local(x, t, _w(), name="c0"))
    with pytest.raises(ValueError):
        obj.error()


def test_batch_broadcast_of_singletons():
    """Batch-1 variables broadcast against batch-B ones."""
    obj = tt.Objective()
    x = tt.Vector(tensor=jnp.zeros((4, 2)), name="x")
    t = tt.Vector(tensor=jnp.ones((1, 2)), name="t")
    obj.add(tt.Local(x, t, _w(), name="c0"))
    e = obj.error()
    assert e.shape == (4, 2)
    # residual = target.local(var) = var - target = -1
    np.testing.assert_allclose(np.asarray(e), -1.0)


def test_error_metric_sums_all_costs():
    obj = tt.Objective()
    obj.add(tt.Local(_vec("x"), _vec("t", 2.0), _w(), name="c0"))
    obj.add(tt.Local(_vec("y", 1.0), _vec("t2", 1.0), _w(), name="c1"))
    # 0.5 * (2^2 * 2 dims + 0) = 4.0
    np.testing.assert_allclose(np.asarray(obj.error_metric()), [4.0])


def test_getters():
    obj = tt.Objective()
    c = tt.Local(_vec("x"), _vec("t"), _w(), name="c0")
    obj.add(c)
    assert obj.get_cost_function("c0") is c
    assert obj.get_cost_function("nope") is None
