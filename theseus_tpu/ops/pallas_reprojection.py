"""Pallas SoA kernel: fused Reprojection linearization (BA hot op).

Per observation and batch element:
    P = R p + t;  proj = -P_xy / P_z;  r2 = |proj|^2
    factor = f (1 + r2 (k1 + r2 k2));  err = proj * factor - feat
with analytic jacobians
    dP/d(pose tangent [lin; ang]) = [R | -R hat(p)],  dP/dp = R
    dproj/dP = [[-1/Pz, 0, Px/Pz^2], [0, -1/Pz, Py/Pz^2]]
    derr/dproj = factor I + 2 f (k1 + 2 r2 k2) proj proj^T
chained in closed form. Same struct-of-arrays layout as the Between kernel
(ops/pallas_between_soa.py): batch on the 128-lane axis, structural dims
unrolled; the whole chain is one Mosaic kernel. Backward is a custom VJP
through the pure-JAX formulation (pallas_call is opaque to AD)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _reference_linearize(pose, point, focal, feat, k1, k2):
    """Pure-JAX closed-form computation (drives the backward; also the
    correctness oracle in tests). Shapes: pose (..., 3, 4), point (..., 3),
    focal/k1/k2 (..., 1), feat (..., 2). Returns (jpose (..., 2, 6),
    jpt (..., 2, 3), err (..., 2))."""
    from ..lie.utils import so3_hat

    r = pose[..., :3]
    p_cam = jnp.einsum("...ij,...j->...i", r, point) + pose[..., 3]
    px, py, pz = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    proj = -p_cam[..., :2] / pz[..., None]
    r2 = jnp.sum(proj * proj, axis=-1)
    f = focal[..., 0]
    k1s, k2s = k1[..., 0], k2[..., 0]
    factor = f * (1.0 + r2 * (k1s + r2 * k2s))
    err = proj * factor[..., None] - feat

    dfdr2 = f * (k1s + 2.0 * r2 * k2s)
    # derr/dproj (..., 2, 2)
    eye2 = jnp.eye(2, dtype=pose.dtype)
    de_dproj = factor[..., None, None] * eye2 + 2.0 * dfdr2[..., None, None] * (
        proj[..., :, None] * proj[..., None, :]
    )
    # dproj/dP (..., 2, 3)
    inv_z = 1.0 / pz
    zeros = jnp.zeros_like(px)
    dproj_dp = jnp.stack(
        [
            jnp.stack([-inv_z, zeros, px * inv_z * inv_z], axis=-1),
            jnp.stack([zeros, -inv_z, py * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )
    de_dp = de_dproj @ dproj_dp  # (..., 2, 3)
    jpt = de_dp @ r
    jpose = jnp.concatenate([de_dp @ r, -(de_dp @ r) @ so3_hat(point)], axis=-1)
    return jpose, jpt, err


def _kernel(pose_ref, pt_ref, focal_ref, feat_ref, k1_ref, k2_ref,
            jpose_ref, jpt_ref, err_ref):
    n_e = pose_ref.shape[0]
    for e in range(n_e):
        r = [[pose_ref[e, 4 * i + j, :] for j in range(3)] for i in range(3)]
        t = [pose_ref[e, 4 * i + 3, :] for i in range(3)]
        p = [pt_ref[e, i, :] for i in range(3)]
        f = focal_ref[e, 0, :]
        k1 = k1_ref[e, 0, :]
        k2 = k2_ref[e, 0, :]

        pc = [sum(r[i][k] * p[k] for k in range(3)) + t[i] for i in range(3)]
        inv_z = 1.0 / pc[2]
        proj = [-pc[0] * inv_z, -pc[1] * inv_z]
        r2 = proj[0] * proj[0] + proj[1] * proj[1]
        factor = f * (1.0 + r2 * (k1 + r2 * k2))
        err = [proj[0] * factor - feat_ref[e, 0, :], proj[1] * factor - feat_ref[e, 1, :]]
        dfdr2 = f * (k1 + 2.0 * r2 * k2)

        # derr/dproj (2x2)
        de = [[factor + 2.0 * dfdr2 * proj[0] * proj[0], 2.0 * dfdr2 * proj[0] * proj[1]],
              [2.0 * dfdr2 * proj[1] * proj[0], factor + 2.0 * dfdr2 * proj[1] * proj[1]]]
        # dproj/dP (2x3)
        dpp = [[-inv_z, 0.0 * inv_z, pc[0] * inv_z * inv_z],
               [0.0 * inv_z, -inv_z, pc[1] * inv_z * inv_z]]
        # de_dp (2x3) = de @ dpp
        dedp = [[sum(de[i][k] * dpp[k][j] for k in range(2)) for j in range(3)] for i in range(2)]
        # jpt = de_dp @ R (2x3)
        jpt = [[sum(dedp[i][k] * r[k][j] for k in range(3)) for j in range(3)] for i in range(2)]
        # jpose = [jpt | -jpt @ hat(p)] (2x6)
        hatp = [[0.0, -p[2], p[1]], [p[2], 0.0, -p[0]], [-p[1], p[0], 0.0]]
        jang = [[-sum(jpt[i][k] * hatp[k][j] for k in range(3)) for j in range(3)] for i in range(2)]

        for i in range(2):
            err_ref[e, i, :] = err[i]
            for j in range(3):
                jpt_ref[e, 3 * i + j, :] = jpt[i][j]
                jpose_ref[e, 6 * i + j, :] = jpt[i][j]
                jpose_ref[e, 6 * i + 3 + j, :] = jang[i][j]


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(pose, point, focal, feat, k1, k2, block_edges, interpret):
    return _run_kernel(pose, point, focal, feat, k1, k2, block_edges, interpret)


def _fused_fwd(pose, point, focal, feat, k1, k2, block_edges, interpret):
    out = _run_kernel(pose, point, focal, feat, k1, k2, block_edges, interpret)
    return out, (pose, point, focal, feat, k1, k2)


def _fused_bwd(block_edges, interpret, res, cots):
    _, vjp_fn = jax.vjp(_reference_linearize, *res)
    return vjp_fn(cots)


_fused.defvjp(_fused_fwd, _fused_bwd)


def reprojection_linearize_soa(pose, point, focal, feat, k1, k2,
                               block_edges: int = 8, interpret: bool = False):
    """All inputs (K, B, ...). Returns (jpose (K,B,2,6), jpt (K,B,2,3),
    err (K,B,2))."""
    return _fused(pose, point, focal, feat, k1, k2, block_edges, interpret)


def _run_kernel(pose, point, focal, feat, k1, k2, block_edges, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, b = pose.shape[0], pose.shape[1]
    # Observation folding: the lane axis carries the batch, and Mosaic pads
    # lanes to 128 — at batch 1 that is a 128x HBM expansion on every
    # operand (observed 170x incl. sublane padding at BA 256x8000: 19.96 GB
    # requested, chip OOM). Every lane is an independent (observation,
    # batch-element) pair, so when b < 128 we fold `fold` consecutive
    # observations into one lane block instead; element-wise arithmetic is
    # bit-identical, only the lane placement changes.
    from .. import config as _config
    fold = (128 // b
            if (_config.PALLAS_LANE_FOLD and b < 128 and 128 % b == 0)
            else 1)
    quantum = block_edges * fold
    pad = (-k) % quantum
    if pad:
        def padk(x):
            return jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])

        pose, point, focal, feat, k1, k2 = map(padk, (pose, point, focal, feat, k1, k2))
    kp = k + pad
    kf = kp // fold
    lanes = fold * b

    def soa(x):  # (K, B, *s) -> (K/fold, prod(s), fold*B)
        flat = x.reshape(kf, fold, b, -1)
        return jnp.transpose(flat, (0, 3, 1, 2)).reshape(kf, flat.shape[-1], lanes)

    def unfold(y, rows):  # (K/fold, rows, fold*B) -> (K, rows, B)
        y = y.reshape(kf, rows, fold, b)
        return jnp.transpose(y, (0, 2, 1, 3)).reshape(kp, rows, b)

    grid = (kf // block_edges,)

    def spec(rows):
        return pl.BlockSpec(
            (block_edges, rows, lanes), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM
        )

    jpose, jpt, err = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec(12), spec(3), spec(1), spec(2), spec(1), spec(1)],
        out_specs=(spec(12), spec(6), spec(2)),
        out_shape=(
            jax.ShapeDtypeStruct((kf, 12, lanes), pose.dtype),
            jax.ShapeDtypeStruct((kf, 6, lanes), pose.dtype),
            jax.ShapeDtypeStruct((kf, 2, lanes), pose.dtype),
        ),
        interpret=interpret,
    )(soa(pose), soa(point), soa(focal), soa(feat), soa(k1), soa(k2))

    jpose, jpt, err = (unfold(jpose, 12), unfold(jpt, 6), unfold(err, 2))
    return (
        jnp.moveaxis(jpose, 1, -1)[:k].reshape(k, b, 2, 6),
        jnp.moveaxis(jpt, 1, -1)[:k].reshape(k, b, 2, 3),
        jnp.moveaxis(err, 1, -1)[:k],
    )
