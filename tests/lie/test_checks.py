"""Lie check contexts: eager validation fires on invalid elements, stays
silent under tracing and when disabled (torchlie semantics: default OFF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.lie import SE3, enable_checks, no_lie_group_check, set_lie_group_check_enabled
from theseus_tpu.lie.checks import check_group, checks_enabled


def test_default_off():
    assert not checks_enabled()
    tt.SE3(tensor=jnp.ones((1, 3, 4)))  # no validation by default


def test_enable_fires_and_restores():
    with enable_checks():
        with pytest.raises(ValueError):
            tt.SE3(tensor=jnp.ones((1, 3, 4)))
        good = SE3.rand(jax.random.PRNGKey(0), 2, dtype=jnp.float64)
        tt.SE3(tensor=good)
        with no_lie_group_check():
            tt.SE3(tensor=jnp.ones((1, 3, 4)))
        assert checks_enabled()
    assert not checks_enabled()


def test_noop_under_tracing():
    with enable_checks():
        @jax.jit
        def f(x):
            check_group(SE3, x)  # traced -> must not raise
            return x.sum()

        f(jnp.ones((1, 3, 4)))
