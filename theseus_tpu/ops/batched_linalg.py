"""Unrolled small-matrix linear algebra for TPU.

XLA's generic `cholesky`/`triangular_solve` lower to blocked algorithms with
dynamic slicing that are very slow for tiny (d<=8) matrices — exactly the
block sizes of the sparse solver (SE3 blocks are 6x6). These routines unroll
the d loop in Python at trace time, so every operation is an elementwise VPU
op over the leading batch dims; the batch axis provides all the parallelism.

Used by sparse/cholesky.py (the BaSpaCho-equivalent numeric core)."""

from __future__ import annotations

import jax.numpy as jnp

SMALL_DIM_MAX = 8


def chol_small(a):
    """Cholesky of (..., d, d) SPD, unrolled Cholesky-Crout. Returns lower L."""
    d = a.shape[-1]
    cols = []  # list of columns, each (..., d)
    l = [[None] * d for _ in range(d)]
    for j in range(d):
        s = a[..., j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        ljj = jnp.sqrt(s)
        l[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, d):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack([l[i][j] if j <= i else zero for j in range(d)], axis=-1)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=-2)


def solve_lower_vec(l, b):
    """L y = b with L (..., d, d) lower, b (..., d) -> y (..., d)."""
    d = l.shape[-1]
    ys = []
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - l[..., i, k] * ys[k]
        ys.append(s / l[..., i, i])
    return jnp.stack(ys, axis=-1)


def solve_upper_vec(u, b):
    """U x = b with U (..., d, d) upper, b (..., d) -> x (..., d)."""
    d = u.shape[-1]
    xs = [None] * d
    for i in reversed(range(d)):
        s = b[..., i]
        for k in range(i + 1, d):
            s = s - u[..., i, k] * xs[k]
        xs[i] = s / u[..., i, i]
    return jnp.stack(xs, axis=-1)


def solve_lower_mat(l, b):
    """L Y = B with B (..., d, k): unrolled rows, broadcast over k."""
    d = l.shape[-1]
    ys = []
    for i in range(d):
        s = b[..., i, :]
        for k in range(i):
            s = s - l[..., i, k, None] * ys[k]
        ys.append(s / l[..., i, i, None])
    return jnp.stack(ys, axis=-2)


def rt_solve_lower(l, c):
    """X = C @ L^{-T} for C (..., k, d): solve X L^T = C row-wise.
    x_j = (c_j - sum_{m<j} x_m L[j, m]) / L[j, j] column-recursive."""
    d = l.shape[-1]
    xs = []
    for j in range(d):
        s = c[..., :, j]
        for m in range(j):
            s = s - xs[m] * l[..., None, j, m]
        xs.append(s / l[..., None, j, j])
    return jnp.stack(xs, axis=-1)
