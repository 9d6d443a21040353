"""LieArray wrapper: closed ops, pytree/jit/vmap transparency, blocked raw
arithmetic (torchlie LieTensor semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu import lie
from theseus_tpu.lie import LieArray


def test_closed_ops_and_escape():
    key = jax.random.PRNGKey(0)
    g = LieArray.rand(lie.SE3, key, 4, dtype=jnp.float64)
    h = LieArray.rand(lie.SE3, jax.random.PRNGKey(1), 4, dtype=jnp.float64)
    np.testing.assert_allclose(
        (g @ h).as_euclidean(), lie.SE3.compose(g.data, h.data), atol=1e-12
    )
    np.testing.assert_allclose(
        g.between(h).log(), lie.SE3.local(g.data, h.data), atol=1e-12
    )
    with pytest.raises(TypeError):
        g + h
    with pytest.raises(ValueError):
        g.compose(LieArray.rand(lie.SO3, key, 4, dtype=jnp.float64))
    d = 0.1 * jax.random.normal(key, (4, 6), dtype=jnp.float64)
    r = g.retract(d)
    np.testing.assert_allclose(g.local(r), d, atol=1e-9)


def test_pytree_jit_vmap():
    g = LieArray.rand(lie.SO3, jax.random.PRNGKey(2), 8, dtype=jnp.float64)

    @jax.jit
    def f(x: LieArray):
        return x.inv().compose(x).log()

    np.testing.assert_allclose(f(g), 0.0, atol=1e-9)

    def one(x: LieArray):
        return x.log()

    logs = jax.vmap(one)(g)
    np.testing.assert_allclose(logs, lie.SO3.log(g.data), atol=1e-12)
