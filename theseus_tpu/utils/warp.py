"""Image sampling helpers for direct-alignment residuals.

Re-design of the reference's explicit bilinear grid_sample
(theseus/third_party/utils.py:5 — written there to be double-backward-safe;
in JAX plain jnp ops differentiate to any order) and the homography warp used
by examples/homography_estimation.py."""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img, xy):
    """img (H, W) or (H, W, C); xy (..., 2) in pixel coords (x, y).
    Samples with border clamping. Returns (...,) or (..., C)."""
    chan = img.ndim == 3
    h, w = img.shape[:2]
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0
    wy = y - y0
    if chan:
        wx = wx[..., None]
        wy = wy[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        (1 - wy) * ((1 - wx) * v00 + wx * v01) + wy * ((1 - wx) * v10 + wx * v11)
    )


def homography_transform(h8, xy):
    """Apply a homography parameterized by its first 8 entries (h33 = 1):
    xy (..., 2) -> warped (..., 2)."""
    hmat = jnp.concatenate([h8, jnp.ones_like(h8[..., :1])], axis=-1).reshape(
        h8.shape[:-1] + (3, 3)
    )
    ones = jnp.ones_like(xy[..., :1])
    p = jnp.concatenate([xy, ones], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", hmat, p)
    return q[..., :2] / q[..., 2:3]


def image_grid(h: int, w: int, dtype=jnp.float32):
    """(h*w, 2) pixel coordinates (x, y)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
