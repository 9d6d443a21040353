"""Batched dense linear solvers for the normal equations.

Re-design of the reference dense solvers (theseus/optimizer/linear/
dense_solver.py:19,125,144): batched Cholesky / LU on AtA with ellipsoidal or
additive damping and optional singular-system zeroing. On TPU these map to
XLA's batched potrf/getrf which run on the MXU; everything is shape-static
and jit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def apply_damping(AtA, damping, ellipsoidal: bool, eps: float):
    """AtA + diag(damping*diag(AtA) + eps) (ellipsoidal) or AtA + damping*I
    (additive) (reference dense_solver.py:38-64). damping: scalar or (B,)."""
    d = jnp.asarray(damping, dtype=AtA.dtype)
    if d.ndim == 0:
        d = jnp.broadcast_to(d, AtA.shape[:-2])
    diag = jnp.diagonal(AtA, axis1=-2, axis2=-1)
    if ellipsoidal:
        add = d[..., None] * diag + eps
    else:
        add = jnp.broadcast_to(d[..., None], diag.shape)
    return AtA + jax.vmap(jnp.diag)(add)


def damping_diag(AtA_diag, damping, ellipsoidal: bool):
    """The per-column damping actually applied (for LM gain-ratio denom)."""
    d = jnp.asarray(damping, dtype=AtA_diag.dtype)
    if d.ndim == 0:
        d = jnp.broadcast_to(d, AtA_diag.shape[:-1])
    if ellipsoidal:
        return d[..., None] * AtA_diag
    return jnp.broadcast_to(d[..., None], AtA_diag.shape)


class DenseCholeskySolver:
    """Batched Cholesky on the normal equations (reference dense_solver.py:144)."""

    supports_ellipsoidal = True

    def __init__(self, check_singular: bool = True, damping_eps: float = 1e-8):
        self.check_singular = check_singular
        self.damping_eps = damping_eps

    def solve(self, AtA, Atb, damping=0.0, ellipsoidal: bool = False):
        """AtA (B, D, D), Atb (B, D) -> delta (B, D)."""
        damped = apply_damping(AtA, damping, ellipsoidal, self.damping_eps)
        L = jnp.linalg.cholesky(damped)
        delta = jsl.cho_solve((L, True), Atb[..., None])[..., 0]

        # mixed-precision iterative refinement (sparse/refine.py; the
        # reference's dense solvers run at the problem dtype, but the f64
        # solve contract of its sparse backends is matched here too so all
        # linearizations share one precision story)
        from .. import config as _config
        from ..sparse.refine import refine_active

        if refine_active(Atb.dtype):
            from ..sparse.refine import hp_dtype, refine

            hp = hp_dtype(Atb.dtype)
            damped_hp = damped.astype(hp)
            delta = refine(
                lambda r: jsl.cho_solve((L, True), r[..., None])[..., 0],
                lambda x: jnp.einsum(
                    "bij,bj->bi", damped_hp, x,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                Atb, delta, _config.REFINE_STEPS,
            )
        if self.check_singular:
            bad = jnp.any(~jnp.isfinite(delta), axis=-1)
            delta = jnp.where(bad[..., None], 0.0, delta)
            return delta, bad
        return delta, jnp.zeros(delta.shape[:-1], dtype=bool)


class DenseLUSolver:
    """Batched LU solve (reference dense_solver.py:125)."""

    supports_ellipsoidal = True

    def __init__(self, check_singular: bool = True, damping_eps: float = 1e-8):
        self.check_singular = check_singular
        self.damping_eps = damping_eps

    def solve(self, AtA, Atb, damping=0.0, ellipsoidal: bool = False):
        damped = apply_damping(AtA, damping, ellipsoidal, self.damping_eps)
        delta = jnp.linalg.solve(damped, Atb[..., None])[..., 0]
        if self.check_singular:
            bad = jnp.any(~jnp.isfinite(delta), axis=-1)
            delta = jnp.where(bad[..., None], 0.0, delta)
            return delta, bad
        return delta, jnp.zeros(delta.shape[:-1], dtype=bool)
