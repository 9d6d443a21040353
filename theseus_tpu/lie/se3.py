"""Functional SE(3) ops on 3x4 [R | t] matrices with analytic jacobians.

TPU-native re-design of the reference's SE3 functional layer
(torchlie/torchlie/functional/se3_impl.py). Data layout: (..., 3, 4) with
rotation in [..., :3] and translation in [..., 3]. Tangent ordering is
[linear(3); angular(3)] (reference se3_impl.py:196-197). Jacobians are wrt
right perturbations g * exp(delta). Numerics follow the reference's Taylor
branches (exp se3_impl.py:178-217, log se3_impl.py:354-432,
jexp se3_impl.py:225-311, jlog se3_impl.py:405-458) with `where`-guarded
denominators, wrapped in `jax.custom_jvp` so the analytic jacobians drive
both forward- and reverse-mode autodiff under vmap/jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import get_eps
from . import so3
from .utils import antisym_project, mvp, nz, outer, so3_hat, transpose

DOF = 6
SHAPE = (3, 4)
NAME = "SE3"

# Near-zero derivative limits (reference torchlie functional/constants.py:21-23)
_D_OMC_NEAR_ZERO = -1.0 / 12.0
_D_TMS_NEAR_ZERO = -1.0 / 60.0


def rotation(g):
    return g[..., :3]


def translation(g):
    return g[..., 3]


def from_rot_trans(r, t):
    return jnp.concatenate([r, t[..., None]], axis=-1)


def hat(x):
    """(..., 6) -> (..., 4, 4) se(3) matrix, [lin; ang] ordering."""
    top = jnp.concatenate([so3_hat(x[..., 3:]), x[..., :3, None]], axis=-1)
    bottom = jnp.zeros(x.shape[:-1] + (1, 4), dtype=x.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def vee(m):
    """(..., 4, 4) -> (..., 6)."""
    ang = jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)
    return jnp.concatenate([m[..., :3, 3], ang], axis=-1)


def lift(x):
    """(..., 6) -> (..., 3, 4): [hat(ang) | lin] (reference se3_impl lift)."""
    return jnp.concatenate([so3_hat(x[..., 3:]), x[..., :3, None]], axis=-1)


def project(m):
    """Adjoint of lift: (..., 3, 4) -> (..., 6) = [m[:, 3]; full antisym diffs]."""
    return jnp.concatenate([m[..., 3], so3.project(m[..., :3])], axis=-1)


def _exp_helper(x):
    v, w = x[..., :3], x[..., 3:]
    r, (theta, theta2, sine, _, sbt, omc) = so3._exp_helper(w)
    near_zero = theta < get_eps("so3", "near_zero", x.dtype)
    theta3_nz = nz(theta * theta2, near_zero)
    # translation branch keeps the Taylor value 1/6 - theta^2/120 near zero
    tms_t = jnp.where(near_zero, 1.0 / 6.0 - theta2 / 120.0, (theta - sine) / theta3_nz)
    t = (
        sbt[..., None] * v
        + omc[..., None] * jnp.cross(w, v)
        + tms_t[..., None] * w * jnp.sum(w * v, axis=-1, keepdims=True)
    )
    ret = from_rot_trans(r, t)
    return ret, (theta, nz(theta2, near_zero), sbt, omc, tms_t)


def jexp(x):
    """6x6 right Jacobian of exp and exp itself: ([J], G)."""
    ret, (theta, theta2_nz, sbt, omc, tms_t) = _exp_helper(x)
    near_zero = theta < get_eps("so3", "near_zero", x.dtype)
    tms_rot = jnp.where(near_zero, jnp.zeros_like(theta), tms_t)

    v, w = x[..., :3], x[..., 3:]
    # rotation block (same as SO3 jexp)
    jrot = tms_rot[..., None, None] * outer(w, w)
    jrot = jrot + sbt[..., None, None] * jnp.eye(3, dtype=x.dtype)
    jrot = jrot - omc[..., None, None] * so3_hat(w)

    d_omc = jnp.where(near_zero, _D_OMC_NEAR_ZERO, (sbt - 2.0 * omc) / theta2_nz)
    d_tms = jnp.where(near_zero, _D_TMS_NEAR_ZERO, (omc - 3.0 * tms_t) / theta2_nz)

    wv = jnp.cross(w, v)
    wwv = jnp.cross(w, wv)
    sw = tms_t[..., None] * w

    jac_temp_t = outer(d_omc[..., None] * wv + d_tms[..., None] * wwv, w)
    jac_temp_t = jac_temp_t - outer(v, sw)
    jac_temp_t = jac_temp_t + so3_hat(-omc[..., None] * v - tms_t[..., None] * wv)
    jac_temp_t = jac_temp_t + jnp.sum(sw * v, axis=-1)[..., None, None] * jnp.eye(
        3, dtype=x.dtype
    )
    q = transpose(ret[..., :3]) @ jac_temp_t

    top = jnp.concatenate([jrot, q], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(q), jrot], axis=-1)
    return [jnp.concatenate([top, bottom], axis=-2)], ret


@jax.custom_jvp
def exp(x):
    """Exponential map se(3) -> SE(3). (..., 6) -> (..., 3, 4)."""
    return _exp_helper(x)[0]


@exp.defjvp
def _exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    (jac,), g = jexp(x)
    d = mvp(jac, dx)
    r = g[..., :3]
    # dG = [R hat(d_ang) | R d_lin]
    return g, jnp.concatenate([r @ so3_hat(d[..., 3:]), mvp(r, d[..., :3])[..., None]], axis=-1)


def _log_helper(g):
    r, t = g[..., :3], g[..., 3]
    ret_ang, (theta, sine, cosine) = so3._log_helper(r)

    near_zero = theta < get_eps("so3", "near_zero", g.dtype)
    theta2 = theta * theta
    sine_theta = sine * theta
    tcm2 = 2.0 * cosine - 2.0
    tcm2_nz = nz(tcm2, near_zero)
    theta2_nz = nz(theta2, near_zero)

    a = jnp.where(near_zero, 1.0 - theta2 / 12.0, -sine_theta / tcm2_nz)
    b = jnp.where(
        near_zero,
        1.0 / 12.0 + theta2 / 720.0,
        (sine_theta + tcm2) / (theta2_nz * tcm2_nz),
    )
    ret_lin = (
        a[..., None] * t
        - 0.5 * jnp.cross(ret_ang, t)
        + b[..., None] * ret_ang * jnp.sum(ret_ang * t, axis=-1, keepdims=True)
    )
    ret = jnp.concatenate([ret_lin, ret_ang], axis=-1)
    return ret, (theta, theta2, theta2_nz, sine, cosine, tcm2_nz, a, b)


def jlog(g):
    """6x6 inverse right Jacobian at log(g): ([J], x)."""
    x, (theta, theta2, theta2_nz, sine, cosine, tcm2_nz, a, b) = _log_helper(g)
    ret_lin, ret_ang = x[..., :3], x[..., 3:]
    d_near_zero = theta < get_eps("so3", "d_near_zero", g.dtype)

    jrot = so3._jlog_from_w(ret_ang, theta, sine, cosine)
    b_dz = jnp.where(
        d_near_zero,
        1.0 / 12.0 + theta2 / 720.0,
        (sine * theta + 2.0 * cosine - 2.0)
        / (nz(theta2, d_near_zero) * nz(2.0 * cosine - 2.0, d_near_zero)),
    )
    b_ret_ang = b_dz[..., None] * ret_ang

    theta_nz = nz(theta, d_near_zero)
    theta4_nz = theta2_nz * theta2_nz
    c = jnp.where(
        d_near_zero,
        -1.0 / 360.0 - theta2 / 7560.0,
        -(2.0 * tcm2_nz + theta * sine + theta2) / (theta4_nz * tcm2_nz),
    )
    d = jnp.where(
        d_near_zero,
        -1.0 / 6.0 - theta2 / 180.0,
        (theta - sine) / (theta_nz * tcm2_nz),
    )
    e = jnp.sum(ret_ang * ret_lin, axis=-1)

    ce_ret_ang = (c * e)[..., None] * ret_ang
    jq = outer(ce_ret_ang, ret_ang)
    jq = jq + outer(b_ret_ang, ret_lin) + outer(ret_lin, b_ret_ang)
    jq = jq + (e * d)[..., None, None] * jnp.eye(3, dtype=g.dtype)
    jq = jq + 0.5 * so3_hat(ret_lin)

    top = jnp.concatenate([jrot, jq], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(jq), jrot], axis=-1)
    return [jnp.concatenate([top, bottom], axis=-2)], x


@jax.custom_jvp
def log(g):
    """Logarithm map SE(3) -> se(3). (..., 3, 4) -> (..., 6)."""
    return _log_helper(g)[0]


@log.defjvp
def _log_jvp(primals, tangents):
    (g,) = primals
    (dg,) = tangents
    (jac,), x = jlog(g)
    r = g[..., :3]
    d_ang = antisym_project(transpose(r) @ dg[..., :3])
    d_lin = mvp(transpose(r), dg[..., 3])
    return x, mvp(jac, jnp.concatenate([d_lin, d_ang], axis=-1))


def compose(g1, g2):
    r1, t1 = g1[..., :3], g1[..., 3]
    r2, t2 = g2[..., :3], g2[..., 3]
    return from_rot_trans(r1 @ r2, mvp(r1, t2) + t1)


def adjoint(g):
    """6x6 adjoint: [[R, hat(t) R], [0, R]] with [lin; ang] ordering."""
    r, t = g[..., :3], g[..., 3]
    htr = so3_hat(t) @ r
    top = jnp.concatenate([r, htr], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(htr), r], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def jcompose(g1, g2):
    """J1 = Adj(g2^{-1}), J2 = I (reference geometry/lie_group.py:162-174)."""
    ret = compose(g1, g2)
    b = jnp.broadcast_shapes(g1.shape[:-2], g2.shape[:-2])
    j1 = jnp.broadcast_to(adjoint(inverse(g2)), b + (6, 6))
    j2 = jnp.broadcast_to(jnp.eye(6, dtype=g1.dtype), b + (6, 6))
    return [j1, j2], ret


def inverse(g):
    r, t = g[..., :3], g[..., 3]
    rt = transpose(r)
    return from_rot_trans(rt, -mvp(rt, t))


def jinverse(g):
    return [-adjoint(g)], inverse(g)


def transform(g, p):
    """Apply pose to point: R p + t. (reference SE3.transform_from)."""
    return mvp(g[..., :3], p) + g[..., 3]


def jtransform(g, p):
    r = g[..., :3]
    ret = mvp(r, p) + g[..., 3]
    b = jnp.broadcast_shapes(g.shape[:-2], p.shape[:-1])
    jg = jnp.concatenate([r, r @ (-so3_hat(p))], axis=-1)
    return [jnp.broadcast_to(jg, b + (3, 6)), jnp.broadcast_to(r, b + (3, 3))], ret


def untransform(g, p):
    """Inverse-apply pose to point: R^T (p - t) (reference SE3.transform_to)."""
    r, t = g[..., :3], g[..., 3]
    return mvp(transpose(r), p - t)


def juntransform(g, p):
    r, t = g[..., :3], g[..., 3]
    ret = mvp(transpose(r), p - t)
    b = jnp.broadcast_shapes(g.shape[:-2], p.shape[:-1])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=g.dtype), b + (3, 3))
    jg = jnp.concatenate([-eye, so3_hat(ret)], axis=-1)
    return [jnp.broadcast_to(jg, b + (3, 6)), jnp.broadcast_to(transpose(r), b + (3, 3))], ret


act = transform


def left_act(g, m):
    return g[..., :3] @ m


def left_project(g, m):
    """Euclidean grad (..., 3, 4) -> right tangent (..., 6)."""
    r = g[..., :3]
    return jnp.concatenate(
        [mvp(transpose(r), m[..., 3]), so3.project(transpose(r) @ m[..., :3])],
        axis=-1,
    )


def to_matrix(g):
    """(..., 3, 4) -> homogeneous (..., 4, 4)."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), g.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([g, bottom], axis=-2)


def identity(*batch, dtype=jnp.float32):
    return jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], -1),
        tuple(batch) + (3, 4),
    )


def rand(key, *batch, dtype=jnp.float32):
    kr, kt = jax.random.split(key)
    r = so3.rand(kr, *batch, dtype=dtype)
    t = jax.random.uniform(kt, tuple(batch) + (3,), dtype=dtype, minval=-1.0, maxval=1.0)
    return from_rot_trans(r, t)


def randn(key, *batch, dtype=jnp.float32):
    return exp(math.pi * jax.random.normal(key, tuple(batch) + (6,), dtype=dtype))


def normalize(g):
    return from_rot_trans(so3.normalize(g[..., :3]), g[..., 3])


def check_group_tensor(g, atol=None):
    return so3.check_group_tensor(g[..., :3], atol)
