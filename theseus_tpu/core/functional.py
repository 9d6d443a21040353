"""Top-level functional API on ManifoldVariables + random constructors.

API parity with the reference's top-level surface (theseus/__init__.py:
compose/between/exp_map/log_map/inverse/adjoint/local/retract operating on
LieGroup objects, and the rand_*/randn_* constructors, geometry/__init__.py).
Here the ops dispatch on the variable's `group` and return new variables;
the random constructors take an explicit JAX PRNG key (there is no global
RNG state in this architecture)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..lie import group as _groupmod
from ..lie.group import euclidean
from .variable import ManifoldVariable


def _g(v: ManifoldVariable):
    if not isinstance(v, ManifoldVariable):
        raise TypeError(f"expected a ManifoldVariable, got {type(v)}")
    return v.group


def _wrap(group, tensor, name=None) -> ManifoldVariable:
    return ManifoldVariable(group, tensor, name)


def compose(a: ManifoldVariable, b: ManifoldVariable, name=None):
    g = _g(a)
    if g != _g(b):
        raise ValueError(f"compose needs matching groups, {g.name} vs {b.group.name}")
    return _wrap(g, g.compose(a.tensor, b.tensor), name)


def between(a: ManifoldVariable, b: ManifoldVariable, name=None):
    g = _g(a)
    if g != _g(b):
        raise ValueError(f"between needs matching groups, {g.name} vs {b.group.name}")
    return _wrap(g, g.between(a.tensor, b.tensor), name)


def inverse(a: ManifoldVariable, name=None):
    g = _g(a)
    return _wrap(g, g.inverse(a.tensor), name)


def log_map(a: ManifoldVariable) -> jnp.ndarray:
    """Group element -> tangent coordinates (B, dof)."""
    return _g(a).log(a.tensor)


def exp_map(tangent, group, name=None) -> ManifoldVariable:
    """Tangent (B, dof) -> group element of `group` (a lie.Group or a
    group-typed variable to borrow the type from)."""
    if isinstance(group, ManifoldVariable):
        group = group.group
    return _wrap(group, group.exp(jnp.asarray(tangent)), name)


def adjoint(a: ManifoldVariable) -> jnp.ndarray:
    return _g(a).adjoint(a.tensor)


def local(a: ManifoldVariable, b: ManifoldVariable) -> jnp.ndarray:
    """Tangent coordinates of b in the frame of a: log(a^-1 b)."""
    g = _g(a)
    if g != _g(b):
        raise ValueError("local needs matching groups")
    return g.local(a.tensor, b.tensor)


def retract(a: ManifoldVariable, delta, name=None) -> ManifoldVariable:
    g = _g(a)
    return _wrap(g, g.retract(a.tensor, jnp.asarray(delta)), name)


# -- random constructors (reference rand_se3(*size) etc.; here key-based) ---


def _rand_ctor(group):
    def rand(key, batch_size: int = 1, dtype=jnp.float32,
             name: Optional[str] = None) -> ManifoldVariable:
        return _wrap(group, group.rand(key, batch_size, dtype=dtype), name)

    def randn(key, batch_size: int = 1, dtype=jnp.float32,
              name: Optional[str] = None) -> ManifoldVariable:
        return _wrap(group, group.randn(key, batch_size, dtype=dtype), name)

    return rand, randn


rand_so2, randn_so2 = _rand_ctor(_groupmod.SO2)
rand_se2, randn_se2 = _rand_ctor(_groupmod.SE2)
rand_so3, randn_so3 = _rand_ctor(_groupmod.SO3)
rand_se3, randn_se3 = _rand_ctor(_groupmod.SE3)
rand_point2, randn_point2 = _rand_ctor(euclidean(2))
rand_point3, randn_point3 = _rand_ctor(euclidean(3))


def rand_vector(key, dof: int, batch_size: int = 1, dtype=jnp.float32,
                name: Optional[str] = None) -> ManifoldVariable:
    g = euclidean(dof)
    return _wrap(g, g.rand(key, batch_size, dtype=dtype), name)


def randn_vector(key, dof: int, batch_size: int = 1, dtype=jnp.float32,
                 name: Optional[str] = None) -> ManifoldVariable:
    g = euclidean(dof)
    return _wrap(g, g.randn(key, batch_size, dtype=dtype), name)
