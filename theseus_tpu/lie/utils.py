"""Shared helpers for the functional Lie layer.

Design notes: every op accepts arbitrary leading batch dimensions (the reference
achieves this with fill_dims/permute_op_dim machinery,
torchlie/torchlie/functional/utils.py:28-44; here plain jnp broadcasting
suffices). `where`-guard substitution of non-zero dummies mirrors the
reference's `_NON_ZERO` trick (torchlie functional/so3_impl.py) to keep
gradients NaN-free at branch points.
"""

from __future__ import annotations

import jax.numpy as jnp

# Dummy non-zero value substituted inside guarded `where` denominators.
NON_ZERO = 1.0


def arctan2(y, x):
    """jnp.arctan2, except inside Pallas kernel tracing where Mosaic lacks an
    atan lowering and a polynomial substitute is used (ops/pallas_math)."""
    from ..ops.pallas_math import atan2_poly, in_pallas

    if in_pallas():
        return atan2_poly(y, x)
    return jnp.arctan2(y, x)


def nz(x, mask):
    """Replace masked entries with a harmless non-zero value (NaN-grad guard)."""
    return jnp.where(mask, NON_ZERO, x)


def so3_hat(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(m):
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def antisym_project(m):
    """vee of the antisymmetric part: (..., 3, 3) -> (..., 3).

    This is SO3 `project` (reference: torchlie functional/so3_impl.py:977);
    its adjoint is `lift` (= hat)."""
    return 0.5 * jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )


def outer(a, b):
    """(..., n), (..., m) -> (..., n, m)."""
    return a[..., :, None] * b[..., None, :]


def mvp(m, v):
    """Batched matrix-vector product (..., n, m) @ (..., m) -> (..., n)."""
    return jnp.einsum("...nm,...m->...n", m, v)


def mmp(a, b):
    """Batched matmul with broadcasting."""
    return a @ b


def transpose(m):
    return jnp.swapaxes(m, -1, -2)
