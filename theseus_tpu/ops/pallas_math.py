"""Math polyfills for Pallas TPU kernels.

Mosaic has no atan/atan2 lowering; inside kernels we substitute a
Cephes-style polynomial atan (range-reduced, f32 accuracy ~1e-7) behind a
trace-time flag that theseus_tpu.lie.utils.arctan2 consults, so the exact
same Lie-op source code traces into kernels."""

from __future__ import annotations

import threading

import jax.numpy as jnp

_state = threading.local()


def in_pallas() -> bool:
    return getattr(_state, "flag", False)


class pallas_tracing:
    def __enter__(self):
        _state.flag = True
        return self

    def __exit__(self, *exc):
        _state.flag = False
        return False


def _atan_poly(x):
    """atan for x >= 0 via Cephes-style range reduction + degree-4-in-z poly."""
    # reduce to [0, 0.4142): tan(pi/8)
    big = x > 2.414213562373095  # tan(3pi/8)
    mid = (x > 0.4142135623730950) & ~big
    y = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    x_r = jnp.where(
        big,
        -1.0 / jnp.where(x == 0, 1.0, x),
        jnp.where(mid, (x - 1.0) / (x + 1.0), x),
    )
    z = x_r * x_r
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    )
    return y + p * z * x_r + x_r


def atan2_poly(y, x):
    """Elementwise atan2 built from the polynomial atan."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    den = jnp.where(den == 0, 1.0, den)
    a = _atan_poly(num / den)
    a = jnp.where(swap, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    a = jnp.where(y < 0, -a, a)
    # atan2(0, 0) = 0 convention
    both_zero = (y == 0) & (x == 0)
    return jnp.where(both_zero, 0.0, a)
