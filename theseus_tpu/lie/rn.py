"""R^n as a trivial Lie group (reference: theseus/geometry/vector.py:16).

Element layout: (..., d). exp/log are the identity, compose is addition.
Because dof varies, ops take the vector itself; the group namespace for a
specific dof is built by `theseus_tpu.lie.group.euclidean(dof)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exp(x):
    return x


def jexp(x):
    return [jnp.broadcast_to(jnp.eye(x.shape[-1], dtype=x.dtype), x.shape + (x.shape[-1],))], x


def log(g):
    return g


def jlog(g):
    return [jnp.broadcast_to(jnp.eye(g.shape[-1], dtype=g.dtype), g.shape + (g.shape[-1],))], g


def compose(g1, g2):
    return g1 + g2


def jcompose(g1, g2):
    ret = g1 + g2
    eye = jnp.broadcast_to(jnp.eye(ret.shape[-1], dtype=ret.dtype), ret.shape + (ret.shape[-1],))
    return [eye, eye], ret


def inverse(g):
    return -g


def jinverse(g):
    return [-jnp.broadcast_to(jnp.eye(g.shape[-1], dtype=g.dtype), g.shape + (g.shape[-1],))], -g


def adjoint(g):
    return jnp.broadcast_to(jnp.eye(g.shape[-1], dtype=g.dtype), g.shape + (g.shape[-1],))


def egrad_to_tangent(g, grad):
    return grad


def retract(g, delta):
    return g + delta


def local(a, b):
    return b - a


def identity(dof, *batch, dtype=jnp.float32):
    return jnp.zeros(tuple(batch) + (dof,), dtype=dtype)


def rand(key, dof, *batch, dtype=jnp.float32):
    return jax.random.uniform(key, tuple(batch) + (dof,), dtype=dtype)


def randn(key, dof, *batch, dtype=jnp.float32):
    return jax.random.normal(key, tuple(batch) + (dof,), dtype=dtype)


def normalize(g):
    return g
