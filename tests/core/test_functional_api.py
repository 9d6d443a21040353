"""Top-level functional API (reference theseus/__init__.py surface):
compose/between/inverse/exp_map/log_map/adjoint/local/retract on
ManifoldVariables, key-based rand_*/randn_* constructors, and the lie-check
context aliases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def test_compose_between_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    a = tt.rand_se3(k1, 4, dtype=jnp.float64, name="a")
    b = tt.rand_se3(k2, 4, dtype=jnp.float64, name="b")
    d = tt.between(a, b)
    b2 = tt.compose(a, d)
    np.testing.assert_allclose(
        np.asarray(b2.tensor), np.asarray(b.tensor), atol=1e-12
    )
    ident = tt.compose(a, tt.inverse(a))
    np.testing.assert_allclose(
        np.asarray(tt.log_map(ident)), 0.0, atol=1e-12
    )


def test_exp_log_roundtrip_and_retract_local():
    key = jax.random.PRNGKey(1)
    t = 0.3 * jax.random.normal(key, (5, 3), dtype=jnp.float64)
    g = tt.exp_map(t, tt.SO3(name="proto"))
    np.testing.assert_allclose(np.asarray(tt.log_map(g)), np.asarray(t),
                               atol=1e-10)
    delta = 0.1 * jax.random.normal(key, (5, 3), dtype=jnp.float64)
    h = tt.retract(g, delta)
    np.testing.assert_allclose(
        np.asarray(tt.local(g, h)), np.asarray(delta), atol=1e-10
    )


def test_adjoint_identity():
    key = jax.random.PRNGKey(2)
    a = tt.rand_se2(key, 3, dtype=jnp.float64)
    ad = tt.adjoint(a)
    assert ad.shape == (3, 3, 3)
    # Adj(g) x == log(g exp(x) g^-1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)) * 0.2)
    lhs = (ad @ x[..., None])[..., 0]
    gx = tt.compose(tt.compose(a, tt.exp_map(x, a)), tt.inverse(a))
    np.testing.assert_allclose(
        np.asarray(lhs), np.asarray(tt.log_map(gx)), atol=1e-9
    )


def test_group_mismatch_rejected():
    k = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="matching groups"):
        tt.compose(tt.rand_se2(k, 1), tt.rand_se3(k, 1))


@pytest.mark.parametrize("ctor,randn,shape", [
    (tt.rand_so2, tt.randn_so2, (2, 2)),
    (tt.rand_se2, tt.randn_se2, (2, 4)),
    (tt.rand_so3, tt.randn_so3, (2, 3, 3)),
    (tt.rand_se3, tt.randn_se3, (2, 3, 4)),
    (tt.rand_point2, tt.randn_point2, (2, 2)),
    (tt.rand_point3, tt.randn_point3, (2, 3)),
])
def test_rand_constructors(ctor, randn, shape):
    k = jax.random.PRNGKey(3)
    for f in (ctor, randn):
        v = f(k, 2, dtype=jnp.float64)
        assert tuple(v.tensor.shape) == shape
        # valid group element: log/exp roundtrip is finite
        assert np.isfinite(np.asarray(tt.log_map(v))).all()
    # deterministic in the key
    np.testing.assert_array_equal(
        np.asarray(ctor(k, 2).tensor), np.asarray(ctor(k, 2).tensor)
    )


def test_rand_vector():
    k = jax.random.PRNGKey(4)
    v = tt.rand_vector(k, 7, 3)
    assert v.tensor.shape == (3, 7) and v.dof == 7
    w = tt.randn_vector(k, 7, 3)
    assert w.tensor.shape == (3, 7)


def test_check_context_aliases():
    with tt.no_lie_group_check():
        pass
    with tt.enable_lie_group_check():
        pass
    with tt.set_lie_group_check_enabled(False):
        pass
