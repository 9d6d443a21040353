"""Functional SE(2) ops on (x, y, cos, sin) vectors.

Data layout matches the reference (theseus/geometry/se2.py:21,110): element is
(..., 4) = (x, y, cos t, sin t); tangent is (..., 3) ordered [lin(2); ang(1)].
Right-perturbation convention throughout. Near-zero Taylor branches follow the
reference's se2 exp/log (theseus/geometry/se2.py) with `where`-guarded
denominators for NaN-free gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import get_eps
from . import so2
from .utils import arctan2, nz

DOF = 3
SHAPE = (4,)
NAME = "SE2"


def rotation(g):
    return g[..., 2:4]


def translation(g):
    return g[..., 0:2]


def _vcoeffs(theta, dtype):
    """a = sin t / t, b = (1 - cos t)/t with Taylor branches."""
    near_zero = jnp.abs(theta) < get_eps("se2", "near_zero", dtype)
    theta_nz = nz(theta, near_zero)
    sine = jnp.sin(theta)
    cosine = jnp.cos(theta)
    theta2 = theta * theta
    a = jnp.where(near_zero, 1.0 - theta2 / 6.0, sine / theta_nz)
    b = jnp.where(near_zero, 0.5 * theta - theta * theta2 / 24.0, (1.0 - cosine) / theta_nz)
    return a, b, sine, cosine


def exp(x):
    """(..., 3) -> (..., 4)."""
    v, theta = x[..., 0:2], x[..., 2]
    a, b, sine, cosine = _vcoeffs(theta, x.dtype)
    tx = a * v[..., 0] - b * v[..., 1]
    ty = b * v[..., 0] + a * v[..., 1]
    return jnp.stack([tx, ty, cosine, sine], axis=-1)


def _dvcoeffs(theta, dtype):
    """d/dtheta of the V-matrix coefficients, with Taylor branches."""
    near_zero = jnp.abs(theta) < get_eps("se2", "d_near_zero", dtype)
    theta_nz = nz(theta, near_zero)
    theta2 = theta * theta
    theta2_nz = nz(theta2, near_zero)
    sine = jnp.sin(theta)
    cosine = jnp.cos(theta)
    da = jnp.where(
        near_zero, -theta / 3.0, (cosine * theta - sine) / theta2_nz
    )
    db = jnp.where(
        near_zero, 0.5 - theta2 / 8.0, (sine * theta - (1.0 - cosine)) / theta2_nz
    )
    return da, db


def jexp(x):
    """3x3 right Jacobian: J_r = [[R^T V, R^T dV/dt v], [0, 1]]."""
    v, theta = x[..., 0:2], x[..., 2]
    a, b, sine, cosine = _vcoeffs(theta, x.dtype)
    da, db = _dvcoeffs(theta, x.dtype)
    ret = exp(x)

    # V = [[a, -b], [b, a]]; R^T V
    # R^T = [[c, s], [-s, c]]
    c, s = cosine, sine
    m00 = c * a + s * b
    m01 = -c * b + s * a
    m10 = -s * a + c * b
    m11 = s * b + c * a
    # dV/dtheta @ v
    dvx = da * v[..., 0] - db * v[..., 1]
    dvy = db * v[..., 0] + da * v[..., 1]
    # R^T @ (dV v)
    q0 = c * dvx + s * dvy
    q1 = -s * dvx + c * dvy

    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    jac = jnp.stack(
        [
            jnp.stack([m00, m01, q0], axis=-1),
            jnp.stack([m10, m11, q1], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return [jac], ret


def log(g):
    """(..., 4) -> (..., 3)."""
    t = g[..., 0:2]
    theta = arctan2(g[..., 3], g[..., 2])
    a, b, _, _ = _vcoeffs(theta, g.dtype)
    # a^2 + b^2 >= 4/pi^2 on the principal branch, so no guard needed
    det_nz = a * a + b * b
    # V^{-1} = [[a, b], [-b, a]] / (a^2 + b^2)
    vx = (a * t[..., 0] + b * t[..., 1]) / det_nz
    vy = (-b * t[..., 0] + a * t[..., 1]) / det_nz
    return jnp.stack([vx, vy, theta], axis=-1)


def jlog(g):
    """jlog = jexp(log(g))^{-1}, exploiting the block-triangular structure."""
    x = log(g)
    (jr,), _ = jexp(x)
    # jr = [[A(2x2), q(2)], [0, 1]] -> inverse = [[A^-1, -A^-1 q], [0, 1]]
    a00, a01, a10, a11 = jr[..., 0, 0], jr[..., 0, 1], jr[..., 1, 0], jr[..., 1, 1]
    q0, q1 = jr[..., 0, 2], jr[..., 1, 2]
    det = a00 * a11 - a01 * a10
    i00, i01 = a11 / det, -a01 / det
    i10, i11 = -a10 / det, a00 / det
    r0 = -(i00 * q0 + i01 * q1)
    r1 = -(i10 * q0 + i11 * q1)
    zero = jnp.zeros_like(det)
    one = jnp.ones_like(det)
    jac = jnp.stack(
        [
            jnp.stack([i00, i01, r0], axis=-1),
            jnp.stack([i10, i11, r1], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return [jac], x


def compose(g1, g2):
    r1 = g1[..., 2:4]
    t = so2.rotate(r1, g2[..., 0:2]) + g1[..., 0:2]
    r = so2.compose(r1, g2[..., 2:4])
    return jnp.concatenate([t, r], axis=-1)


def inverse(g):
    rinv = so2.inverse(g[..., 2:4])
    t = -so2.rotate(rinv, g[..., 0:2])
    return jnp.concatenate([t, rinv], axis=-1)


def adjoint(g):
    """[[R, perp(-t)], [0, 1]] with perp(-t) = (t1, -t0); [lin; ang] ordering."""
    c, s = g[..., 2], g[..., 3]
    t0, t1 = g[..., 0], g[..., 1]
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, t1], axis=-1),
            jnp.stack([s, c, -t0], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def jcompose(g1, g2):
    ret = compose(g1, g2)
    b = jnp.broadcast_shapes(g1.shape[:-1], g2.shape[:-1])
    j1 = jnp.broadcast_to(adjoint(inverse(g2)), b + (3, 3))
    j2 = jnp.broadcast_to(jnp.eye(3, dtype=g1.dtype), b + (3, 3))
    return [j1, j2], ret


def jinverse(g):
    return [-adjoint(g)], inverse(g)


def transform(g, p):
    """R p + t (reference SE2.transform_from)."""
    return so2.rotate(g[..., 2:4], p) + g[..., 0:2]


def jtransform(g, p):
    r = g[..., 2:4]
    ret = transform(g, p)
    rm = so2.to_matrix(r)
    perp = jnp.stack([-p[..., 1], p[..., 0]], axis=-1)
    jtheta = so2.rotate(r, perp)[..., None]
    b = jnp.broadcast_shapes(g.shape[:-1], p.shape[:-1])
    jg = jnp.concatenate([jnp.broadcast_to(rm, b + (2, 2)), jnp.broadcast_to(jtheta, b + (2, 1))], axis=-1)
    return [jg, jnp.broadcast_to(rm, b + (2, 2))], ret


def untransform(g, p):
    """R^T (p - t) (reference SE2.transform_to)."""
    return so2.unrotate(g[..., 2:4], p - g[..., 0:2])


def juntransform(g, p):
    ret = untransform(g, p)
    b = jnp.broadcast_shapes(g.shape[:-1], p.shape[:-1])
    eye = jnp.broadcast_to(jnp.eye(2, dtype=g.dtype), b + (2, 2))
    perp = jnp.stack([ret[..., 1], -ret[..., 0]], axis=-1)[..., None]
    jg = jnp.concatenate([-eye, jnp.broadcast_to(perp, b + (2, 1))], axis=-1)
    rtm = so2.to_matrix(so2.inverse(g[..., 2:4]))
    return [jg, jnp.broadcast_to(rtm, b + (2, 2))], ret


act = transform


def to_matrix(g):
    """(..., 4) -> homogeneous (..., 3, 3) [[R, t], [0, 1]]."""
    r = so2.to_matrix(g[..., 2:4])
    top = jnp.concatenate([r, g[..., 0:2, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=g.dtype), g.shape[:-1] + (1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def hat(x):
    """Tangent (..., 3)=[lin(2); ang] -> se(2) matrix (..., 3, 3)."""
    top = jnp.concatenate([so2.hat(x[..., 2:3]), x[..., :2, None]], axis=-1)
    bottom = jnp.zeros(x.shape[:-1] + (1, 3), dtype=x.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def vee(m):
    """(..., 3, 3) -> (..., 3) = [m[:2, 2]; m[1, 0]]."""
    return jnp.concatenate([m[..., :2, 2], m[..., 1:2, 0]], axis=-1)


def lift(x):
    """(..., 3) -> (..., 2, 3): [hat(ang) | lin] (mirrors se3.lift)."""
    return jnp.concatenate([so2.hat(x[..., 2:3]), x[..., :2, None]], axis=-1)


def project(m):
    """Adjoint of lift: (..., 2, 3) -> (..., 3) = [m[:, 2]; so2.project(m[:, :2])]."""
    return jnp.concatenate([m[..., 2], so2.project(m[..., :2])], axis=-1)


def left_act(g, m):
    """Rotation-part left action (mirrors se3.left_act): R(g) @ m, m (..., 2, K)."""
    return so2.to_matrix(g[..., 2:4]) @ m


def left_project(g, m):
    """Euclidean grad in [R | t] rep (..., 2, 3) -> right tangent (..., 3)."""
    r = so2.to_matrix(g[..., 2:4])
    rt = jnp.swapaxes(r, -1, -2)
    return jnp.concatenate(
        [(rt @ m[..., 2:3])[..., 0], so2.project(rt @ m[..., :2])], axis=-1
    )


def egrad_to_tangent(g, grad):
    """Euclidean grad (..., 4) -> right-tangent grad (..., 3)."""
    c, s = g[..., 2], g[..., 3]
    gv0 = c * grad[..., 0] + s * grad[..., 1]
    gv1 = -s * grad[..., 0] + c * grad[..., 1]
    gtheta = -s * grad[..., 2] + c * grad[..., 3]
    return jnp.stack([gv0, gv1, gtheta], axis=-1)


def identity(*batch, dtype=jnp.float32):
    return jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0, 0.0], dtype=dtype), tuple(batch) + (4,)
    )


def rand(key, *batch, dtype=jnp.float32):
    kt, kr = jax.random.split(key)
    t = jax.random.uniform(kt, tuple(batch) + (2,), dtype=dtype, minval=-1.0, maxval=1.0)
    r = so2.rand(kr, *batch, dtype=dtype)
    return jnp.concatenate([t, r], axis=-1)


def randn(key, *batch, dtype=jnp.float32):
    return exp(jnp.pi * jax.random.normal(key, tuple(batch) + (3,), dtype=dtype))


def normalize(g):
    return jnp.concatenate([g[..., 0:2], so2.normalize(g[..., 2:4])], axis=-1)


def check_group_tensor(g, atol=1e-4):
    return so2.check_group_tensor(g[..., 2:4], atol)
