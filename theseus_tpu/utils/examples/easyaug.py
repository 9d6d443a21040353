"""Random geometric + photometric augmentation for direct-alignment training.

Re-design of the vendored easyaug (reference theseus/third_party/easyaug.py:
90 `RandomGeoAug`, :339 `RandomPhotoAug`) as pure JAX over explicit PRNG
keys. The reference's stateful torch modules become dataclass configs whose
`forward(key, imgs)` is pure and jittable/vmappable; per-op probabilities and
magnitudes mirror the reference's `GeoAugParam`/`PhotoAugParam` knobs
(easyaug.py:85,333). Images are (B, H, W) or (B, C, H, W) floats in [0, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..warp import bilinear_sample, homography_transform, image_grid


# ---------------------------------------------------------------------------
# low-level helpers
# ---------------------------------------------------------------------------


def random_homography(key, h: int, w: int, perturb: float = 0.1, dtype=jnp.float32):
    """Random 8-param homography mapping the image onto itself with corner
    jitter of +-perturb * min(h, w). Returns h8 (8,)."""
    scale = perturb * min(h, w)
    corners = jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]], dtype
    )
    jitter = scale * jax.random.uniform(key, (4, 2), dtype=dtype, minval=-1, maxval=1)
    return homography_from_corners(corners, corners + jitter)


def homography_from_corners(src, dst):
    """DLT solve for the 8-param homography mapping 4 src points to dst."""
    rows = []
    rhs = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = dst[i, 0], dst[i, 1]
        z = 0.0 * x
        rows.append(jnp.stack([x, y, 1.0 + z, z, z, z, -u * x, -u * y]))
        rhs.append(u)
        rows.append(jnp.stack([z, z, z, x, y, 1.0 + z, -v * x, -v * y]))
        rhs.append(v)
    return jnp.linalg.solve(jnp.stack(rows), jnp.stack(rhs))


def _warp_one(img, h8):
    """img (H, W) warped by h8; sample position = H(h8) @ grid."""
    h, w = img.shape[:2]
    grid = image_grid(h, w, dtype=img.dtype)
    return bilinear_sample(img, homography_transform(h8, grid)).reshape(img.shape)


def _map_channels(fn, imgs):
    """Apply fn over leading batch(+channel) dims of (B, [C,] H, W)."""
    if imgs.ndim == 3:
        return jax.vmap(fn)(imgs)
    return jax.vmap(jax.vmap(fn))(imgs)


def geo_aug(key, img, perturb: float = 0.08):
    """Warp an image (H, W) by a random homography; returns (warped, h8)."""
    h, w = img.shape[:2]
    h8 = random_homography(key, h, w, perturb, dtype=img.dtype)
    return _warp_one(img, h8), h8


def photo_aug(key, img, brightness=0.2, contrast=0.2, gamma=0.2, noise=0.02):
    """Random brightness/contrast/gamma/additive-noise (values in [0, 1])."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = brightness * jax.random.uniform(k1, (), minval=-1, maxval=1)
    c = 1.0 + contrast * jax.random.uniform(k2, (), minval=-1, maxval=1)
    g = jnp.exp(gamma * jax.random.uniform(k3, (), minval=-1, maxval=1))
    out = jnp.clip(c * img + b, 1e-4, 1.0) ** g
    out = out + noise * jax.random.normal(k4, img.shape, dtype=img.dtype)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# RandomGeoAug (reference easyaug.py:90)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GeoAugParam:
    """min/max range of one geometric factor (reference easyaug.py:85)."""

    min: float = 0.0
    max: float = 0.0

    def sample(self, key, shape=()):
        return jax.random.uniform(
            key, shape, minval=self.min, maxval=self.max
        )


@dataclasses.dataclass
class RandomGeoAug:
    """Random perspective transform per batch element: scale, rotation,
    x/y translation, and perspective (corner) distortion composed into one
    3x3 homography (reference _get_perspective_matrix easyaug.py:148).

    `forward(key, imgs, return_transform=False)` warps (B, [C,] H, W) images
    and optionally returns the (B, 3, 3) pixel-space transforms."""

    scale_param: GeoAugParam = dataclasses.field(
        default_factory=lambda: GeoAugParam(0.9, 1.1)
    )
    rotate_param: GeoAugParam = dataclasses.field(
        default_factory=lambda: GeoAugParam(-0.25, 0.25)
    )  # radians
    translate_x_param: GeoAugParam = dataclasses.field(
        default_factory=lambda: GeoAugParam(-0.1, 0.1)
    )  # fraction of W
    translate_y_param: GeoAugParam = dataclasses.field(
        default_factory=lambda: GeoAugParam(-0.1, 0.1)
    )  # fraction of H
    perspective_param: GeoAugParam = dataclasses.field(
        default_factory=lambda: GeoAugParam(-0.1, 0.1)
    )  # corner jitter fraction

    def set_all_identity(self):
        """Zero all ranges (reference easyaug.py:249)."""
        self.scale_param = GeoAugParam(1.0, 1.0)
        self.rotate_param = GeoAugParam(0.0, 0.0)
        self.translate_x_param = GeoAugParam(0.0, 0.0)
        self.translate_y_param = GeoAugParam(0.0, 0.0)
        self.perspective_param = GeoAugParam(0.0, 0.0)

    def _transform(self, key, h: int, w: int, dtype):
        ks = jax.random.split(key, 5)
        s = self.scale_param.sample(ks[0]).astype(dtype)
        th = self.rotate_param.sample(ks[1]).astype(dtype)
        tx = (w * self.translate_x_param.sample(ks[2])).astype(dtype)
        ty = (h * self.translate_y_param.sample(ks[3])).astype(dtype)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0

        # rigid+scale about the image center, then translation
        c, si = jnp.cos(th) * s, jnp.sin(th) * s
        corners = jnp.asarray(
            [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]],
            dtype,
        )
        rel = corners - jnp.asarray([cx, cy], dtype)
        rot = jnp.stack(
            [c * rel[:, 0] - si * rel[:, 1], si * rel[:, 0] + c * rel[:, 1]],
            axis=-1,
        )
        dst = rot + jnp.asarray([cx + tx, cy + ty], dtype)

        # perspective: independent corner jitter
        mag = self.perspective_param
        jit = jax.random.uniform(
            ks[4], (4, 2), dtype=dtype, minval=mag.min, maxval=mag.max
        ) * jnp.asarray([w, h], dtype)
        dst = dst + jit
        return homography_from_corners(corners, dst)

    def forward(self, key, imgs, return_transform: bool = False):
        b = imgs.shape[0]
        h, w = imgs.shape[-2:]
        keys = jax.random.split(key, b)
        h8s = jax.vmap(lambda k: self._transform(k, h, w, imgs.dtype))(keys)
        if imgs.ndim == 3:
            out = jax.vmap(_warp_one)(imgs, h8s)
        else:
            out = jax.vmap(
                lambda im, t: jax.vmap(lambda ch: _warp_one(ch, t))(im)
            )(imgs, h8s)
        if not return_transform:
            return out
        mats = jnp.concatenate(
            [h8s, jnp.ones((b, 1), imgs.dtype)], axis=-1
        ).reshape(b, 3, 3)
        return out, mats

    __call__ = forward


# ---------------------------------------------------------------------------
# RandomPhotoAug (reference easyaug.py:339)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PhotoAugParam:
    """probability + magnitude of one photometric op (easyaug.py:333)."""

    prob: float = 0.5
    mag: float = 0.5


_PHOTO_OPS = (
    "contrast",
    "sharpen",
    "exposure",
    "gamma",
    "gaussian_smooth",
    "motion_blur",
    "shadow_highlight",
    "gaussian_noise",
    "salt_and_pepper",
)


@dataclasses.dataclass
class RandomPhotoAug:
    """The reference's 9-op photometric pipeline (easyaug.py:434-639), each
    applied with its own probability/magnitude: contrast, sharpen, exposure,
    gamma, gaussian smoothing, motion blur, shadow/highlight, gaussian
    noise, salt-and-pepper. Pure function of an explicit PRNG key; each op
    is gated per batch element with `jnp.where` so the whole pipeline jits
    to one fused program."""

    params: dict = dataclasses.field(
        default_factory=lambda: {op: PhotoAugParam() for op in _PHOTO_OPS}
    )

    def set_all_probs(self, val: float):
        for p in self.params.values():
            p.prob = val

    def set_all_mags(self, val: float):
        for p in self.params.values():
            p.mag = val

    # -- ops (img: (H, W) single channel plane, values [0, 1]) ----------
    @staticmethod
    def contrast(key, img, mag):
        f = 1.0 + mag * jax.random.uniform(key, (), minval=-1, maxval=1)
        m = jnp.mean(img)
        return (img - m) * f + m

    @staticmethod
    def sharpen(key, img, mag):
        blur = _box_blur(img, 1)
        amt = mag * jax.random.uniform(key, ())
        return img + amt * (img - blur)

    @staticmethod
    def exposure(key, img, mag):
        f = 2.0 ** (mag * jax.random.uniform(key, (), minval=-1, maxval=1))
        return img * f

    @staticmethod
    def gamma(key, img, mag):
        g = jnp.exp(mag * jax.random.uniform(key, (), minval=-1, maxval=1))
        return jnp.clip(img, 1e-4, 1.0) ** g

    @staticmethod
    def gaussian_smooth(key, img, mag):
        sigma = 0.3 + mag * jax.random.uniform(key, ()) * 1.7
        return _gaussian_blur(img, sigma)

    @staticmethod
    def motion_blur(key, img, mag):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=0.0, maxval=jnp.pi)
        length = 1.0 + mag * jax.random.uniform(k2, ()) * 6.0
        return _motion_blur(img, theta, length)

    @staticmethod
    def shadow_highlight(key, img, mag):
        k1, k2 = jax.random.split(key)
        lo = mag * 0.3 * jax.random.uniform(k1, ())
        hi = 1.0 - mag * 0.3 * jax.random.uniform(k2, ())
        return jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-3), 0.0, 1.0)

    @staticmethod
    def gaussian_noise(key, img, mag):
        return img + 0.08 * mag * jax.random.normal(key, img.shape, img.dtype)

    @staticmethod
    def salt_and_pepper(key, img, mag):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, img.shape)
        p = 0.02 * mag
        salt = jax.random.uniform(k2, img.shape) > 0.5
        out = jnp.where(u < p, jnp.where(salt, 1.0, 0.0), img)
        return out.astype(img.dtype)

    def forward(self, key, imgs):
        """imgs (B, [C,] H, W) -> augmented, each op applied with prob."""
        b = imgs.shape[0]

        def aug_plane(key, img):
            out = img
            for op in _PHOTO_OPS:
                key, kp, ko = jax.random.split(key, 3)
                p = self.params[op]
                gate = jax.random.uniform(kp, ()) < p.prob
                cand = getattr(self, op)(ko, out, p.mag)
                out = jnp.where(gate, jnp.clip(cand, 0.0, 1.0), out)
            return out

        keys = jax.random.split(key, b)
        return _map_channels_keys(aug_plane, keys, imgs)

    __call__ = forward


def _map_channels_keys(fn, keys, imgs):
    if imgs.ndim == 3:
        return jax.vmap(fn)(keys, imgs)
    return jax.vmap(lambda k, im: jax.vmap(lambda ch: fn(k, ch))(im))(keys, imgs)


def _box_blur(img, radius: int):
    k = 2 * radius + 1
    kern = jnp.ones((k,), img.dtype) / k
    pad = [(radius, radius), (0, 0)]
    a = jnp.pad(img, pad, mode="edge")
    a = jax.vmap(lambda col: jnp.convolve(col, kern, mode="valid"), 1, 1)(a)
    pad = [(0, 0), (radius, radius)]
    a = jnp.pad(a, pad, mode="edge")
    a = jax.vmap(lambda row: jnp.convolve(row, kern, mode="valid"), 0, 0)(a)
    return a


def _gaussian_blur(img, sigma, radius: int = 3):
    xs = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    kern = jnp.exp(-0.5 * (xs / sigma) ** 2)
    kern = kern / jnp.sum(kern)
    a = jnp.pad(img, [(radius, radius), (0, 0)], mode="edge")
    a = jax.vmap(lambda col: jnp.convolve(col, kern, mode="valid"), 1, 1)(a)
    a = jnp.pad(a, [(0, 0), (radius, radius)], mode="edge")
    a = jax.vmap(lambda row: jnp.convolve(row, kern, mode="valid"), 0, 0)(a)
    return a


def _motion_blur(img, theta, length, radius: int = 4):
    xs = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    gx, gy = jnp.meshgrid(xs, xs)
    # soft line kernel along theta with extent `length`
    d_along = gx * jnp.cos(theta) + gy * jnp.sin(theta)
    d_perp = -gx * jnp.sin(theta) + gy * jnp.cos(theta)
    kern = jnp.exp(-0.5 * (d_perp / 0.5) ** 2) * (
        jnp.abs(d_along) <= length / 2.0
    )
    kern = kern / jnp.maximum(jnp.sum(kern), 1e-6)
    pr = [(radius, radius), (radius, radius)]
    a = jnp.pad(img, pr, mode="edge")
    return jax.lax.conv_general_dilated(
        a[None, None], kern[None, None], (1, 1), "VALID"
    )[0, 0]
