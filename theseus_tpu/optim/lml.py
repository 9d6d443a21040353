"""LML: differentiable soft top-k (limited multi-label) projection.

Re-design of the vendored LML layer (reference theseus/third_party/lml.py:38,
from Amos et al., "The Limited Multi-Label Projection Layer"): solve
sum_i sigmoid(x_i + nu) = N for nu per row (monotone; bracketed Newton with
fixed iteration count under jit), y = sigmoid(x + nu); the backward is the
closed-form implicit-function adjoint via jax.custom_vjp."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def lml(x, n: int, n_iter: int = 40):
    """x (..., m) -> y (..., m) with sum(y) ~= n, 0 < y < 1."""
    return _lml_forward(x, n, n_iter)


def _lml_forward(x, n, n_iter):
    m = x.shape[-1]
    if n >= m:
        return jnp.ones_like(x)

    # initial bracket: nu in [-max(x)-20, -min(x)+20]
    lo = -jnp.max(x, axis=-1) - 20.0
    hi = -jnp.min(x, axis=-1) + 20.0

    def g(nu):
        return jnp.sum(jax.nn.sigmoid(x + nu[..., None]), axis=-1) - n

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        val = g(mid)
        lo = jnp.where(val < 0, mid, lo)
        hi = jnp.where(val < 0, hi, mid)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=n_iter)
    nu = 0.5 * (lo + hi)

    # polish with a few Newton steps (g' = sum sigmoid')
    def newton(nu, _):
        y = jax.nn.sigmoid(x + nu[..., None])
        val = jnp.sum(y, axis=-1) - n
        dval = jnp.sum(y * (1 - y), axis=-1)
        return nu - val / jnp.maximum(dval, 1e-12), None

    nu, _ = jax.lax.scan(newton, nu, None, length=5)
    return jax.nn.sigmoid(x + nu[..., None])


def _lml_fwd(x, n, n_iter):
    y = _lml_forward(x, n, n_iter)
    return y, y


def _lml_bwd(n, n_iter, y, gbar):
    """Implicit adjoint: dy_i/dx_j = s_i delta_ij - s_i s_j / sum(s),
    s = y(1-y)."""
    s = y * (1 - y)
    ssum = jnp.maximum(jnp.sum(s, axis=-1, keepdims=True), 1e-12)
    inner = jnp.sum(gbar * s, axis=-1, keepdims=True)
    return (s * gbar - s * inner / ssum,)


lml.defvjp(_lml_fwd, _lml_bwd)
