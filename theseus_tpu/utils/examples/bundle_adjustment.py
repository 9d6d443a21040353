"""Bundle adjustment datasets: synthetic generator and BAL-format loader.

Re-design of the reference BA helpers
(theseus/utils/examples/bundle_adjustment/data.py:16 Camera, :142
Observation, :151 synthetic generator + BAL loader). The synthetic generator
is fully vectorized (one jitted call); cameras look at a point cloud from a
ring, observations are the projections plus noise, with optional outliers.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import core
from ...embodied import Reprojection
from ...lie import se3, so3


@dataclasses.dataclass
class BAProblem:
    """num_cameras cameras, num_points world points, observations linking
    them. Shapes: poses (C, B, 3, 4), points (P, B, 3), focal (C, B, 1),
    obs image points (O, B, 2), obs_cam/obs_pt (O,) int."""

    poses: jnp.ndarray
    points: jnp.ndarray
    focals: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    obs_cam: np.ndarray
    obs_pt: np.ndarray
    obs_img: jnp.ndarray
    gt_poses: Optional[jnp.ndarray] = None
    gt_points: Optional[jnp.ndarray] = None

    @property
    def num_cameras(self):
        return self.poses.shape[0]

    @property
    def num_points(self):
        return self.points.shape[0]


@partial(
    jax.jit,
    static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11),
)
def _synthetic_ba_tensors(
    obs_cam,
    obs_pt,
    num_cameras,
    num_points,
    batch,
    seed,
    pixel_noise,
    pose_noise,
    point_noise,
    outlier_fraction,
    focal,
    dtype=jnp.float64,
):
    """The tensor half of synthetic_ba as ONE jitted program: on a remote
    TPU backend, eager dispatch would pay a per-op compile round-trip
    (measured: ~75 s of setup for a tiny problem vs <1 s jitted)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    # point cloud in a box ahead of the camera ring
    points = jax.random.uniform(
        k1, (num_points, batch, 3), dtype=dtype, minval=-1.0, maxval=1.0
    ) + jnp.asarray([0.0, 0.0, 5.0], dtype)

    # cameras on a ring, all looking roughly at the cloud center
    angles = jnp.linspace(-0.4, 0.4, num_cameras, dtype=dtype)
    cam_pos = jnp.stack(
        [5.0 * jnp.sin(angles), 0.2 * angles, 5.0 * (1 - jnp.cos(angles))], axis=-1
    )  # (C, 3)
    rot = so3.exp(jnp.stack([jnp.zeros_like(angles), -angles, jnp.zeros_like(angles)], -1))
    # world-to-camera pose: x_cam = R (x - c) => pose = [R | -R c]
    trans = -jnp.einsum("cij,cj->ci", rot, cam_pos)
    poses = jnp.broadcast_to(
        jnp.concatenate([rot, trans[..., None]], axis=-1)[:, None],
        (num_cameras, batch, 3, 4),
    )
    focals = jnp.full((num_cameras, batch, 1), focal, dtype)

    def project(pose, pt, f):
        pc = se3.transform(pose, pt)
        proj = -pc[..., :2] / pc[..., 2:3]
        return proj * f

    obs_img = jax.vmap(
        lambda ci, pi: project(poses[ci], points[pi], focals[ci])
    )(obs_cam, obs_pt)
    obs_img = obs_img + pixel_noise * jax.random.normal(k2, obs_img.shape, dtype=dtype)
    if outlier_fraction > 0:
        out_mask = (
            jax.random.uniform(k6, (obs_img.shape[0], batch, 1)) < outlier_fraction
        )
        obs_img = jnp.where(
            out_mask, obs_img + 100.0 * jax.random.normal(k5, obs_img.shape, dtype=dtype), obs_img
        )

    noisy_poses = se3.compose(
        poses, se3.exp(pose_noise * jax.random.normal(k3, (num_cameras, batch, 6), dtype=dtype))
    )
    noisy_points = points + point_noise * jax.random.normal(k4, points.shape, dtype=dtype)
    return noisy_poses, noisy_points, focals, obs_img, poses, points


def synthetic_ba(
    num_cameras: int = 8,
    num_points: int = 50,
    batch: int = 1,
    seed: int = 0,
    pixel_noise: float = 1e-3,
    pose_noise: float = 0.05,
    point_noise: float = 0.05,
    outlier_fraction: float = 0.0,
    visibility: float = 1.0,
    focal: float = 1000.0,
    dtype=jnp.float64,
) -> BAProblem:
    # observations: each camera sees a deterministic subset of points
    # (visibility < 1 gives the sparse bipartite structure of real BA);
    # index logic on the host (numpy)
    obs_cam_all = np.repeat(np.arange(num_cameras), num_points)
    obs_pt_all = np.tile(np.arange(num_points), num_cameras)
    if visibility < 1.0:
        keep = (obs_cam_all + obs_pt_all * 7) % 100 < int(visibility * 100)
        # ensure each point is seen by >= 2 cameras
        for pi in range(num_points):
            idx = np.where(obs_pt_all == pi)[0]
            if keep[idx].sum() < 2:
                keep[idx[:2]] = True
        obs_cam, obs_pt = obs_cam_all[keep], obs_pt_all[keep]
    else:
        obs_cam, obs_pt = obs_cam_all, obs_pt_all

    noisy_poses, noisy_points, focals, obs_img, poses, points = (
        _synthetic_ba_tensors(
            jnp.asarray(obs_cam), jnp.asarray(obs_pt),
            num_cameras, num_points, batch, seed,
            pixel_noise, pose_noise, point_noise, outlier_fraction, focal,
            dtype,
        )
    )
    zc = jnp.zeros((num_cameras, batch, 1), dtype)
    return BAProblem(
        poses=noisy_poses,
        points=noisy_points,
        focals=focals,
        k1=zc,
        k2=zc,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_img=obs_img,
        gt_poses=poses,
        gt_points=points,
    )


def load_bal(path: str, batch: int = 1, dtype=jnp.float64) -> BAProblem:
    """Bundle-Adjustment-in-the-Large text format: header
    'num_cams num_points num_obs', then obs lines 'cam pt x y', then per-cam
    9 params (angle-axis(3), t(3), f, k1, k2), then per-point xyz."""
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    nc, npts, nobs = int(next(it)), int(next(it)), int(next(it))
    obs_cam = np.empty(nobs, np.int64)
    obs_pt = np.empty(nobs, np.int64)
    obs_img = np.empty((nobs, 2))
    for i in range(nobs):
        obs_cam[i] = int(next(it))
        obs_pt[i] = int(next(it))
        obs_img[i] = (float(next(it)), float(next(it)))
    cams = np.array([float(next(it)) for _ in range(9 * nc)]).reshape(nc, 9)
    pts = np.array([float(next(it)) for _ in range(3 * npts)]).reshape(npts, 3)

    rot = so3.exp(jnp.asarray(cams[:, :3], dtype))
    poses = jnp.concatenate([rot, jnp.asarray(cams[:, 3:6], dtype)[..., None]], axis=-1)

    def b(x):
        return jnp.broadcast_to(jnp.asarray(x, dtype)[:, None], (x.shape[0], batch) + x.shape[1:])

    return BAProblem(
        poses=b(np.asarray(poses)),
        points=b(pts),
        focals=b(cams[:, 6:7]),
        k1=b(cams[:, 7:8]),
        k2=b(cams[:, 8:9]),
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_img=jnp.broadcast_to(jnp.asarray(obs_img, dtype)[:, None], (nobs, batch, 2)),
    )


def save_bal(path: str, prob: BAProblem, batch_index: int = 0) -> None:
    """Write one batch element of a BAProblem in the BAL text format
    (round-trip inverse of load_bal; the reference has no writer — loader at
    /root/reference/theseus/utils/examples/bundle_adjustment/data.py:151)."""
    poses = np.asarray(prob.poses[:, batch_index])  # (C,3,4)
    aa = np.asarray(so3.log(jnp.asarray(poses[:, :, :3])))  # (C,3)
    t = poses[:, :, 3]
    f = np.asarray(prob.focals[:, batch_index, 0])
    k1 = np.asarray(prob.k1[:, batch_index, 0])
    k2 = np.asarray(prob.k2[:, batch_index, 0])
    pts = np.asarray(prob.points[:, batch_index])  # (P,3)
    obs_img = np.asarray(prob.obs_img[:, batch_index])  # (O,2)
    with open(path, "w") as fh:
        fh.write(f"{poses.shape[0]} {pts.shape[0]} {len(prob.obs_cam)}\n")
        for o in range(len(prob.obs_cam)):
            fh.write(f"{int(prob.obs_cam[o])} {int(prob.obs_pt[o])} "
                     f"{obs_img[o, 0]:.17g} {obs_img[o, 1]:.17g}\n")
        for c in range(poses.shape[0]):
            for v in (*aa[c], *t[c], f[c], k1[c], k2[c]):
                fh.write(f"{v:.17g}\n")
        for p in range(pts.shape[0]):
            for v in pts[p]:
                fh.write(f"{v:.17g}\n")


def build_ba_objective(
    prob: BAProblem,
    dtype=jnp.float64,
    robust_loss_cls=None,
    log_loss_radius: float = 0.0,
    fix_first_camera: bool = True,
    gauge_target=None,
    weight=None,
    use_families: bool = True,
):
    """Reprojection objective (reference examples/bundle_adjustment.py:112):
    one Reprojection cost per observation over SE3 camera vars and Point3
    landmark vars; optional robust wrapper; prior on camera 0 for gauge.

    Default path uses the bulk family API (core/family.py): ONE CostFamily
    over a camera VariableFamily + point VariableFamily, with pre-stacked
    per-observation aux — O(1) construction and trace-time operands at BAL
    scale (2*10^5 observations), where the per-cost path (use_families=False,
    kept for parity tests) is O(N) in both."""
    if use_families:
        return _build_ba_objective_family(
            prob, dtype, robust_loss_cls, log_loss_radius, fix_first_camera,
            gauge_target, weight,
        )
    obj = core.Objective(dtype=dtype)
    cams = [core.SE3(name=f"cam_{i}") for i in range(prob.num_cameras)]
    pts = [core.Point3(name=f"pt_{i}") for i in range(prob.num_points)]
    from ...embodied import Local

    if fix_first_camera:
        target = prob.poses[0] if gauge_target is None else gauge_target
        obj.add(
            Local(
                cams[0],
                target,
                core.ScaleCostWeight(jnp.asarray(1e4, dtype)),
                name="gauge",
            )
        )
    # materialize once: per-observation device slicing would pay an eager
    # dispatch round-trip each (4 ops x O(10^4) observations on remote TPU)
    focals_np = np.asarray(prob.focals)
    obs_img_np = np.asarray(prob.obs_img)
    k1_np, k2_np = np.asarray(prob.k1), np.asarray(prob.k2)
    for oi in range(len(prob.obs_cam)):
        ci, pi = int(prob.obs_cam[oi]), int(prob.obs_pt[oi])
        cost = Reprojection(
            cams[ci],
            pts[pi],
            focal_length=focals_np[ci],
            image_feature_point=obs_img_np[oi],
            calib_k1=k1_np[ci],
            calib_k2=k2_np[ci],
            cost_weight=weight,
            name=f"obs_{oi}",
        )
        if robust_loss_cls is not None:
            cost = core.RobustCostFunction(
                cost,
                robust_loss_cls,
                jnp.full((1, 1), log_loss_radius, dtype),
                name=f"robs_{oi}",
            )
        obj.add(cost)
    return obj, cams, pts


def _build_ba_objective_family(
    prob: BAProblem,
    dtype,
    robust_loss_cls,
    log_loss_radius,
    fix_first_camera,
    gauge_target,
    weight,
):
    from ...embodied import Local

    obj = core.Objective(dtype=dtype)
    cam_fam = core.SE3Family(prob.num_cameras, name="cam")
    pt_fam = core.Point3Family(prob.num_points, name="pt")

    if fix_first_camera:
        target = prob.poses[0] if gauge_target is None else gauge_target
        obj.add(
            Local(
                cam_fam[0],
                target,
                core.ScaleCostWeight(jnp.asarray(1e4, dtype)),
                name="gauge",
            )
        )

    obs_cam = np.asarray(prob.obs_cam)
    obs_pt = np.asarray(prob.obs_pt)
    # per-observation stacked aux: gathered on the host in one shot
    focals_np = np.asarray(prob.focals)[obs_cam]  # (O, B, 1)
    obs_img_np = np.asarray(prob.obs_img)  # (O, B, 2)
    k1_np = np.asarray(prob.k1)[obs_cam]
    k2_np = np.asarray(prob.k2)[obs_cam]
    template = Reprojection(
        cam_fam[0],
        pt_fam[0],
        focal_length=core.Variable(focals_np, name="obs_focal"),
        image_feature_point=core.Variable(obs_img_np, name="obs_img"),
        calib_k1=core.Variable(k1_np, name="obs_k1"),
        calib_k2=core.Variable(k2_np, name="obs_k2"),
        cost_weight=weight,
        name="obs_template",
    )
    if robust_loss_cls is not None:
        template = core.RobustCostFunction(
            template,
            robust_loss_cls,
            core.Variable(
                np.full((1, 1), log_loss_radius, np.asarray(focals_np).dtype),
                name="obs_log_radius",
            ),
            name="obs_robust_template",
        )
    obj.add(
        core.CostFamily(
            template,
            members=[(cam_fam, obs_cam), (pt_fam, obs_pt)],
            name="obs",
        )
    )
    return obj, cam_fam, pt_fam


def ba_values(prob: BAProblem, use_families: bool = True) -> Dict[str, jnp.ndarray]:
    if use_families:
        # family layout: one (N, B, ...) array per family
        return {"cam": np.asarray(prob.poses), "pt": np.asarray(prob.points)}
    poses = np.asarray(prob.poses)  # one transfer, host-side slicing
    points = np.asarray(prob.points)
    vals = {f"cam_{i}": poses[i] for i in range(prob.num_cameras)}
    vals.update({f"pt_{i}": points[i] for i in range(prob.num_points)})
    return vals
