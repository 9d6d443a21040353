"""Unit tests for LM adaptive-damping and Dogleg trust-region dynamics
(reference tests/theseus_tests/optimizer/nonlinear/test_levenberg_marquardt.py
and trust_region.py:113-135 semantics): accepted good steps lower damping /
can expand the radius; rejected steps raise damping / shrink the radius and
leave the state untouched."""

import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def quad_problem(bad_scale=None):
    """1-var quadratic: err = x - t, solved exactly by one GN step."""
    x = tt.Vector(tensor=jnp.zeros((2, 2)), name="x")
    t = tt.Variable(jnp.asarray([[1.0, 2.0], [3.0, -1.0]]), name="t")
    obj = tt.Objective()
    obj.add(tt.Local(x, t, tt.ScaleCostWeight(1.0), name="c"))
    return obj


def _carry_after_one(opt, opts, values=None):
    co = opt.objective.compile()
    vals = opt.objective.default_values(values or {})
    b = co.resolve_batch_size(vals)
    state = co.pack(vals, b)
    aux = co.build_aux(vals, b)
    carry = opt.init_carry(state, aux, opts)
    return carry, aux


def test_lm_damping_decreases_on_accept():
    obj = quad_problem()
    opt = tt.LevenbergMarquardt(obj, max_iterations=3, adaptive_damping=True)
    opts = opt.opts
    carry, aux = _carry_after_one(opt, opts)
    d0 = np.asarray(carry["damping"])
    out = opt.iteration(carry, aux, opts)
    d1 = np.asarray(out["damping"])
    # the linear problem gives a perfect gain ratio -> accept + divide
    np.testing.assert_allclose(d1, d0 / opts.down_damping_ratio, rtol=1e-6)
    assert np.all(np.asarray(out["err"]) < np.asarray(carry["err"]))


def test_lm_damping_increases_and_state_frozen_on_reject():
    obj = quad_problem()
    # a huge step_size makes the tentative point WORSE -> rho < accept
    opt = tt.LevenbergMarquardt(obj, max_iterations=3, adaptive_damping=True,
                                step_size=10.0)
    opts = opt.opts
    carry, aux = _carry_after_one(opt, opts)
    d0 = np.asarray(carry["damping"])
    x0 = np.asarray(carry["state"]["Rn2"])
    out = opt.iteration(carry, aux, opts)
    d1 = np.asarray(out["damping"])
    np.testing.assert_allclose(d1, np.minimum(
        d0 * opts.up_damping_ratio, opts.max_damping), rtol=1e-6)
    # rejected: error and state unchanged
    np.testing.assert_array_equal(np.asarray(out["err"]),
                                  np.asarray(carry["err"]))
    np.testing.assert_array_equal(np.asarray(out["state"]["Rn2"]), x0)


def test_lm_damping_clamped():
    obj = quad_problem()
    opt = tt.LevenbergMarquardt(obj, max_iterations=12, adaptive_damping=True)
    opts = opt.opts
    carry, aux = _carry_after_one(opt, opts)
    for _ in range(12):
        carry = opt.iteration(carry, aux, opts)
    d = np.asarray(carry["damping"])
    assert np.all(d >= opts.min_damping - 1e-12)
    assert np.all(d <= opts.max_damping + 1e-12)


def test_dogleg_radius_expands_on_good_step_shrinks_on_reject():
    obj = quad_problem()
    opt = tt.Dogleg(obj, max_iterations=3)
    opts = opt.opts
    carry, aux = _carry_after_one(opt, opts)
    tr0 = np.asarray(carry["damping"])  # scalar state slot carries the radius
    np.testing.assert_allclose(tr0, opts.trust_region_init)
    out = opt.iteration(carry, aux, opts)
    tr1 = np.asarray(out["damping"])
    # exact quadratic: rho ~ 1 > expand_threshold -> radius grows
    np.testing.assert_allclose(tr1, np.minimum(
        tr0 * opts.expand_ratio, opts.max_trust_region), rtol=1e-6)

    opt2 = tt.Dogleg(obj, max_iterations=3, step_size=25.0)
    opts2 = opt2.opts
    carry2, aux2 = _carry_after_one(opt2, opts2)
    out2 = opt2.iteration(carry2, aux2, opts2)
    tr2 = np.asarray(out2["damping"])
    assert np.all(tr2 <= np.asarray(carry2["damping"]) * opts2.shrink_ratio + 1e-9)
    np.testing.assert_array_equal(np.asarray(out2["err"]),
                                  np.asarray(carry2["err"]))
