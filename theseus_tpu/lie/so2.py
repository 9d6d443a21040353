"""Functional SO(2) ops on (cos, sin) pairs.

Data layout matches the reference (theseus/geometry/so2.py:19): element is
(..., 2) = (cos theta, sin theta); tangent is (..., 1). All jacobians for a
1-dof commutative group are trivial identities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import arctan2

DOF = 1
SHAPE = (2,)
NAME = "SO2"


def exp(w):
    """(..., 1) -> (..., 2)."""
    theta = w[..., 0]
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def jexp(w):
    ret = exp(w)
    return [jnp.ones(w.shape[:-1] + (1, 1), dtype=w.dtype)], ret


def log(g):
    return arctan2(g[..., 1], g[..., 0])[..., None]


def jlog(g):
    ret = log(g)
    return [jnp.ones(g.shape[:-1] + (1, 1), dtype=g.dtype)], ret


def compose(g1, g2):
    c1, s1 = g1[..., 0], g1[..., 1]
    c2, s2 = g2[..., 0], g2[..., 1]
    return jnp.stack([c1 * c2 - s1 * s2, s1 * c2 + c1 * s2], axis=-1)


def jcompose(g1, g2):
    ret = compose(g1, g2)
    b = jnp.broadcast_shapes(g1.shape[:-1], g2.shape[:-1])
    one = jnp.ones(b + (1, 1), dtype=g1.dtype)
    return [one, one], ret


def inverse(g):
    return jnp.stack([g[..., 0], -g[..., 1]], axis=-1)


def jinverse(g):
    return [-jnp.ones(g.shape[:-1] + (1, 1), dtype=g.dtype)], inverse(g)


def adjoint(g):
    return jnp.ones(g.shape[:-1] + (1, 1), dtype=g.dtype)


def to_matrix(g):
    c, s = g[..., 0], g[..., 1]
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate(g, p):
    c, s = g[..., 0:1], g[..., 1:2]
    return jnp.concatenate(
        [c * p[..., 0:1] - s * p[..., 1:2], s * p[..., 0:1] + c * p[..., 1:2]], axis=-1
    )


def jrotate(g, p):
    ret = rotate(g, p)
    # d/d delta rotate(g exp(delta), p) = R * perp(p)
    perp = jnp.stack([-p[..., 1], p[..., 0]], axis=-1)
    jg = rotate(g, perp)[..., None]
    return [jg, to_matrix(g)], ret


def unrotate(g, p):
    return rotate(inverse(g), p)


def junrotate(g, p):
    ret = unrotate(g, p)
    jg = jnp.stack([ret[..., 1], -ret[..., 0]], axis=-1)[..., None]
    return [jg, to_matrix(inverse(g))], ret


act = rotate


def hat(w):
    theta = w[..., 0]
    zero = jnp.zeros_like(theta)
    return jnp.stack(
        [jnp.stack([zero, -theta], axis=-1), jnp.stack([theta, zero], axis=-1)],
        axis=-2,
    )


def vee(m):
    return m[..., 1, 0][..., None]


lift = hat


def project(m):
    """Adjoint of lift: antisymmetric part of a (..., 2, 2) matrix -> (..., 1)
    (reference torchlie lift/project duality; <lift(x), m> == <x, project(m)>)."""
    return (m[..., 1, 0] - m[..., 0, 1])[..., None]


def left_act(g, m):
    """Matrix-rep left action: R(g) @ m for m of shape (..., 2, K)."""
    return to_matrix(g) @ m


def left_project(g, m):
    """Euclidean grad in matrix rep (..., 2, 2) -> right tangent (..., 1):
    project(R^T m) (reference torchlie functional left_project convention)."""
    r = to_matrix(g)
    return project(jnp.swapaxes(r, -1, -2) @ m)


def egrad_to_tangent(g, grad):
    """Euclidean grad (..., 2) wrt (cos, sin) -> right-tangent grad (..., 1).

    d/d delta (g exp(delta)) at 0 has ambient direction (-sin, cos), so the
    tangent gradient is <grad, (-sin, cos)> (reference geometry/so2.py project)."""
    return (-g[..., 1] * grad[..., 0] + g[..., 0] * grad[..., 1])[..., None]


def identity(*batch, dtype=jnp.float32):
    return jnp.broadcast_to(jnp.array([1.0, 0.0], dtype=dtype), tuple(batch) + (2,))


def rand(key, *batch, dtype=jnp.float32):
    theta = jax.random.uniform(
        key, tuple(batch) + (1,), dtype=dtype, minval=-jnp.pi, maxval=jnp.pi
    )
    return exp(theta)


def randn(key, *batch, dtype=jnp.float32):
    return exp(jnp.pi * jax.random.normal(key, tuple(batch) + (1,), dtype=dtype))


def normalize(g):
    return g / jnp.linalg.norm(g, axis=-1, keepdims=True)


def check_group_tensor(g, atol=1e-4):
    return jnp.abs(jnp.sum(g * g, axis=-1) - 1.0) < atol
