"""Pallas SoA kernel: fused SE3 Between linearization.

The PGO hot op (diff = v1^{-1} v2, r = log(m^{-1} diff), J2 = jlog(·),
J1 = -J2 Adj(diff^{-1})) as ONE Mosaic kernel in struct-of-arrays layout:
inputs are transposed to (K, 12, B) so every matrix entry is a full
(B,)-lane vector and all math is elementwise on the VPU — the layout the
hardware wants for tiny geometric blocks (natural (.., 3, 4) layouts hit
Mosaic's minor-dim reduction limits). The SE3/SO3 formulas are scalarized
ports of theseus_tpu.lie.{so3,se3} (same branches, same eps), with the
polynomial atan2 from ops/pallas_math (Mosaic has no atan lowering).

Enabled for the sparse/dense PGO path via
`theseus_tpu.embodied.measurements.Between` when config.USE_PALLAS_BETWEEN
is set; validated against the pure-JAX path in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_eps
from .pallas_math import atan2_poly

# ---------------------------------------------------------------------------
# scalarized 3x3 / SE3 math: matrices are 3x3 nested lists of (B,) vectors,
# translations are length-3 lists
# ---------------------------------------------------------------------------


def _mm(a, b):
    return [[sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)] for i in range(3)]


def _mt(a):
    return [[a[j][i] for j in range(3)] for i in range(3)]


def _mv(a, v):
    return [sum(a[i][k] * v[k] for k in range(3)) for i in range(3)]


def _se3_inverse(r, t):
    rt = _mt(r)
    return rt, [-x for x in _mv(rt, t)]


def _se3_compose(r1, t1, r2, t2):
    return _mm(r1, r2), [a + b for a, b in zip(_mv(r1, t2), t1)]


def _so3_log(r, dtype):
    """Scalarized port of lie/so3._log_helper. Returns (w[3], theta, sine, cosine)."""
    sa = [
        0.5 * (r[2][1] - r[1][2]),
        0.5 * (r[0][2] - r[2][0]),
        0.5 * (r[1][0] - r[0][1]),
    ]
    cosine = 0.5 * (r[0][0] + r[1][1] + r[2][2] - 1.0)
    sine = jnp.sqrt(sa[0] ** 2 + sa[1] ** 2 + sa[2] ** 2)
    theta = atan2_poly(sine, cosine)

    near_zero = theta < get_eps("so3", "near_zero", dtype)
    near_pi = (1.0 + cosine) <= get_eps("so3", "near_pi", dtype)
    near_either = near_zero | near_pi
    sine_nz = jnp.where(near_either, 1.0, sine)
    scale = jnp.where(near_either, 1.0 + sine * sine / 6.0, theta / sine_nz)
    ret = [s * scale for s in sa]

    d = [r[0][0], r[1][1], r[2][2]]
    is1 = (d[1] > d[0]) & (d[1] > d[2])
    is2 = (d[2] > d[0]) & (d[2] > d[1])
    is0 = ~(is1 | is2)
    masks = [is0, is1, is2]
    sel = []
    for j in range(3):
        rowj = sum(jnp.where(masks[k], r[k][j], 0.0) for k in range(3))
        colj = sum(jnp.where(masks[k], r[j][k], 0.0) for k in range(3))
        onehot = jnp.where(masks[j], 1.0, 0.0)
        sel.append(0.5 * (rowj + colj) - cosine * onehot)
    an = jnp.sqrt(sel[0] ** 2 + sel[1] ** 2 + sel[2] ** 2)
    an_nz = jnp.where(near_pi, an, 1.0)
    sine_major = sum(jnp.where(masks[k], sa[k], 0.0) for k in range(3))
    sign = jnp.where(sine_major >= 0, 1.0, -1.0)
    w = [
        jnp.where(near_pi, sel[k] / an_nz * theta * sign, ret[k])
        for k in range(3)
    ]
    return w, theta, sine, cosine


def _se3_log(r, t, dtype):
    """Scalarized port of lie/se3._log_helper: returns (lin[3], ang[3],
    theta, sine, cosine)."""
    w, theta, sine, cosine = _so3_log(r, dtype)
    near_zero = theta < get_eps("so3", "near_zero", dtype)
    theta2 = theta * theta
    sine_theta = sine * theta
    tcm2 = 2.0 * cosine - 2.0
    tcm2_nz = jnp.where(near_zero, 1.0, tcm2)
    theta2_nz = jnp.where(near_zero, 1.0, theta2)
    a = jnp.where(near_zero, 1.0 - theta2 / 12.0, -sine_theta / tcm2_nz)
    b = jnp.where(
        near_zero, 1.0 / 12.0 + theta2 / 720.0, (sine_theta + tcm2) / (theta2_nz * tcm2_nz)
    )
    wxt = [
        w[1] * t[2] - w[2] * t[1],
        w[2] * t[0] - w[0] * t[2],
        w[0] * t[1] - w[1] * t[0],
    ]
    wt = w[0] * t[0] + w[1] * t[1] + w[2] * t[2]
    lin = [a * t[k] - 0.5 * wxt[k] + b * w[k] * wt for k in range(3)]
    return lin, w, theta, sine, cosine


def _so3_jlog(w, theta, sine, cosine, dtype):
    """Scalarized lie/so3._jlog_from_w: 3x3 nested list."""
    dz = theta < get_eps("so3", "d_near_zero", dtype)
    theta2 = theta * theta
    st = sine * theta
    tcm2 = 2.0 * cosine - 2.0
    tcm2_nz = jnp.where(dz, 1.0, tcm2)
    theta2_nz = jnp.where(dz, 1.0, theta2)
    a = jnp.where(dz, 1.0 - theta2 / 12.0, -st / tcm2_nz)
    b = jnp.where(dz, 1.0 / 12.0 + theta2 / 720.0, (st + tcm2) / (theta2_nz * tcm2_nz))
    hat = [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]]
    out = [[b * w[i] * w[j] + 0.5 * hat[i][j] for j in range(3)] for i in range(3)]
    for i in range(3):
        out[i][i] = out[i][i] + a
    return out


def _se3_jlog(lin, ang, theta, sine, cosine, dtype):
    """Scalarized lie/se3.jlog body: 6x6 nested list ([lin; ang] order)."""
    jrot = _so3_jlog(ang, theta, sine, cosine, dtype)
    dz = theta < get_eps("so3", "d_near_zero", dtype)
    theta2 = theta * theta
    tcm2 = 2.0 * cosine - 2.0
    tcm2_nz = jnp.where(theta < get_eps("so3", "near_zero", dtype), 1.0, tcm2)
    theta2_nz = jnp.where(theta < get_eps("so3", "near_zero", dtype), 1.0, theta2)
    st = sine * theta
    b_dz = jnp.where(
        dz,
        1.0 / 12.0 + theta2 / 720.0,
        (st + tcm2) / (jnp.where(dz, 1.0, theta2) * jnp.where(dz, 1.0, tcm2)),
    )
    theta_nz = jnp.where(dz, 1.0, theta)
    theta4_nz = theta2_nz * theta2_nz
    c = jnp.where(
        dz,
        -1.0 / 360.0 - theta2 / 7560.0,
        -(2.0 * tcm2_nz + st + theta2) / (theta4_nz * tcm2_nz),
    )
    dcoef = jnp.where(dz, -1.0 / 6.0 - theta2 / 180.0, (theta - sine) / (theta_nz * tcm2_nz))
    e = ang[0] * lin[0] + ang[1] * lin[1] + ang[2] * lin[2]
    br = [b_dz * a for a in ang]
    hatl = [[0.0, -lin[2], lin[1]], [lin[2], 0.0, -lin[0]], [-lin[1], lin[0], 0.0]]
    jq = [
        [
            c * e * ang[i] * ang[j] + br[i] * lin[j] + lin[i] * br[j] + 0.5 * hatl[i][j]
            for j in range(3)
        ]
        for i in range(3)
    ]
    for i in range(3):
        jq[i][i] = jq[i][i] + e * dcoef
    out = [[None] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = jrot[i][j]
            out[i][3 + j] = jq[i][j]
            out[3 + i][j] = jnp.zeros_like(theta)
            out[3 + i][3 + j] = jrot[i][j]
    return out


def _se3_adjoint(r, t):
    """6x6 nested list: [[R, hat(t) R], [0, R]]."""
    hat_t = [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
    htr = _mm(hat_t, r)
    out = [[None] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = r[i][j]
            out[i][3 + j] = htr[i][j]
            out[3 + i][j] = jnp.zeros_like(r[0][0])
            out[3 + i][3 + j] = r[i][j]
    return out


def _mm6(a, b):
    return [[sum(a[i][k] * b[k][j] for k in range(6)) for j in range(6)] for i in range(6)]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(v1_ref, v2_ref, m_ref, j1_ref, j2_ref, err_ref):
    dtype = v1_ref.dtype

    def unpack(ref, e):
        # SoA rows follow the row-major (3, 4) [R | t] flattening
        r = [[ref[e, 4 * i + j, :] for j in range(3)] for i in range(3)]
        t = [ref[e, 4 * i + 3, :] for i in range(3)]
        return r, t

    n_e = v1_ref.shape[0]
    for e in range(n_e):
        r1, t1 = unpack(v1_ref, e)
        r2, t2 = unpack(v2_ref, e)
        rm, tm = unpack(m_ref, e)

        r1i, t1i = _se3_inverse(r1, t1)
        rd, td = _se3_compose(r1i, t1i, r2, t2)  # diff
        rmi, tmi = _se3_inverse(rm, tm)
        rc, tc = _se3_compose(rmi, tmi, rd, td)  # m^-1 diff

        lin, ang, theta, sine, cosine = _se3_log(rc, tc, dtype)
        jl = _se3_jlog(lin, ang, theta, sine, cosine, dtype)
        rdi, tdi = _se3_inverse(rd, td)
        adj = _se3_adjoint(rdi, tdi)
        j1 = _mm6(jl, adj)

        for i in range(6):
            err_ref[e, i, :] = (lin + ang)[i]
            for j in range(6):
                j1_ref[e, 6 * i + j, :] = -j1[i][j]
                j2_ref[e, 6 * i + j, :] = jl[i][j]


def _reference_linearize(v1, v2, meas):
    """Pure-JAX computation of the same outputs (drives the backward pass)."""
    from ..lie import se3

    diff = se3.compose(se3.inverse(v1), v2)
    (jl,), res = se3.jlog(se3.compose(se3.inverse(meas), diff))
    j1 = -(jl @ se3.adjoint(se3.inverse(diff)))
    return j1, jl, res


def between_linearize_soa(v1, v2, meas, block_edges: int = 4,
                          interpret: bool = False):
    """v1, v2, meas (K, B, 3, 4) -> (j1 (K,B,6,6), j2, err (K,B,6)).

    Differentiable: the forward runs the fused Mosaic kernel; gradients are
    produced by a custom VJP that differentiates the pure-JAX formulation at
    the same primals (pallas_call itself is opaque to autodiff). Outer-loop
    learning through unroll/truncated/implicit modes therefore works with the
    fused path enabled."""
    return _fused_vjp(v1, v2, meas, block_edges, interpret)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_vjp(v1, v2, meas, block_edges, interpret):
    return _between_linearize_kernel(v1, v2, meas, block_edges, interpret)


def _fused_fwd(v1, v2, meas, block_edges, interpret):
    out = _between_linearize_kernel(v1, v2, meas, block_edges, interpret)
    return out, (v1, v2, meas)


def _fused_bwd(block_edges, interpret, res, cots):
    v1, v2, meas = res
    _, vjp_fn = jax.vjp(_reference_linearize, v1, v2, meas)
    return vjp_fn(cots)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def _between_linearize_kernel(v1, v2, meas, block_edges: int = 4,
                              interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, b = v1.shape[0], v1.shape[1]
    # Edge folding (same trick as ops/pallas_reprojection.py): the lane axis
    # carries the batch and Mosaic pads lanes to 128, so at b < 128 every
    # operand/output inflates 128/b x in HBM and the kernel computes on
    # mostly-masked lanes. Each lane is an independent (edge, batch) pair,
    # so fold = 128//b consecutive edges share one lane block instead;
    # element-wise arithmetic is bit-identical.
    from .. import config as _config
    fold = (128 // b
            if (_config.PALLAS_LANE_FOLD and b < 128 and 128 % b == 0)
            else 1)
    quantum = block_edges * fold
    pad = (-k) % quantum
    if pad:
        v1, v2, meas = (
            jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
            for x in (v1, v2, meas)
        )
    kp = k + pad
    kf = kp // fold
    lanes = fold * b

    def soa(x):  # (K, B, 3, 4) -> (K/fold, 12, fold*B)
        flat = x.reshape(kf, fold, b, 12)
        return jnp.transpose(flat, (0, 3, 1, 2)).reshape(kf, 12, lanes)

    def unfold(y, rows):  # (K/fold, rows, fold*B) -> (K, rows, B)
        y = y.reshape(kf, rows, fold, b)
        return jnp.transpose(y, (0, 2, 1, 3)).reshape(kp, rows, b)

    grid = (kf // block_edges,)

    def spec(rows):
        return pl.BlockSpec(
            (block_edges, rows, lanes), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM
        )

    j1, j2, err = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec(12)] * 3,
        out_specs=(spec(36), spec(36), spec(6)),
        out_shape=(
            jax.ShapeDtypeStruct((kf, 36, lanes), v1.dtype),
            jax.ShapeDtypeStruct((kf, 36, lanes), v1.dtype),
            jax.ShapeDtypeStruct((kf, 6, lanes), v1.dtype),
        ),
        interpret=interpret,
    )(soa(v1), soa(v2), soa(meas))

    j1, j2, err = (unfold(j1, 36), unfold(j2, 36), unfold(err, 6))
    return (
        jnp.moveaxis(j1, 1, -1)[:k].reshape(k, b, 6, 6),
        jnp.moveaxis(j2, 1, -1)[:k].reshape(k, b, 6, 6),
        jnp.moveaxis(err, 1, -1)[:k],
    )
