"""Random geometric + photometric augmentation for direct-alignment training.

Re-design of the vendored easyaug (reference theseus/third_party/easyaug.py:
90 RandomGeoAug, :339 RandomPhotoAug) as pure JAX functions over PRNG keys:
random homographies (perspective jitter of the unit square corners) and
photometric perturbations (brightness/contrast/gamma/noise)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..warp import bilinear_sample, homography_transform, image_grid


def random_homography(key, h: int, w: int, perturb: float = 0.1, dtype=jnp.float32):
    """Random 8-param homography mapping the image onto itself with corner
    jitter of +-perturb * min(h, w). Returns h8 (8,)."""
    scale = perturb * min(h, w)
    corners = jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]], dtype
    )
    jitter = scale * jax.random.uniform(key, (4, 2), dtype=dtype, minval=-1, maxval=1)
    dst = corners + jitter
    # solve DLT for H mapping corners -> dst (8 equations, 8 unknowns)
    rows = []
    rhs = []
    for i in range(4):
        x, y = corners[i]
        u, v = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0 * x, 0.0 * x, 0.0 * x, -u * x, -u * y]))
        rhs.append(u)
        rows.append(jnp.stack([0.0 * x, 0.0 * x, 0.0 * x, x, y, 1.0, -v * x, -v * y]))
        rhs.append(v)
    a = jnp.stack(rows)
    b = jnp.stack(rhs)
    return jnp.linalg.solve(a, b)


def geo_aug(key, img, perturb: float = 0.08):
    """Warp an image (H, W) by a random homography; returns (warped, h8)."""
    h, w = img.shape[:2]
    h8 = random_homography(key, h, w, perturb, dtype=img.dtype)
    grid = image_grid(h, w, dtype=img.dtype)
    warped = bilinear_sample(img, homography_transform(h8, grid))
    return warped.reshape(img.shape), h8


def photo_aug(key, img, brightness=0.2, contrast=0.2, gamma=0.2, noise=0.02):
    """Random brightness/contrast/gamma/additive-noise (values in [0, 1])."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = brightness * jax.random.uniform(k1, (), minval=-1, maxval=1)
    c = 1.0 + contrast * jax.random.uniform(k2, (), minval=-1, maxval=1)
    g = jnp.exp(gamma * jax.random.uniform(k3, (), minval=-1, maxval=1))
    out = jnp.clip(c * img + b, 1e-4, 1.0) ** g
    out = out + noise * jax.random.normal(k4, img.shape, dtype=img.dtype)
    return jnp.clip(out, 0.0, 1.0)
