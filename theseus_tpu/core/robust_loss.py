"""Robust loss kernels rho(x) with IRLS linearization factors rho'(x).

Pure-function re-design of the reference's RobustLoss family
(theseus/core/robust_loss.py:13-113). `x` is the squared norm ||w e||^2,
`log_radius` parameterizes the radius as exp(log_radius) so it can be learned
unconstrained. GNC losses take an extra annealing control `mu`
(Geman-McClure, reference robust_loss.py:96).
"""

from __future__ import annotations

import jax.numpy as jnp

LOSS_EPS = 1e-20


class WelschLoss:
    is_gnc = False

    @staticmethod
    def evaluate(x, log_radius):
        radius = jnp.exp(log_radius)
        return radius - radius * jnp.exp(-x / (radius + LOSS_EPS))

    @staticmethod
    def linearize(x, log_radius):
        radius = jnp.exp(log_radius)
        return jnp.exp(-x / (radius + LOSS_EPS))


class HuberLoss:
    is_gnc = False

    @staticmethod
    def evaluate(x, log_radius):
        radius = jnp.exp(log_radius)
        return jnp.where(
            x > radius,
            2.0 * jnp.sqrt(radius * jnp.maximum(x, radius) + LOSS_EPS) - radius,
            x,
        )

    @staticmethod
    def linearize(x, log_radius):
        radius = jnp.exp(log_radius)
        return jnp.sqrt(radius / jnp.maximum(x, radius) + LOSS_EPS)


class HingeLoss:
    is_gnc = False

    @staticmethod
    def evaluate(x, log_radius):
        radius = jnp.exp(log_radius)
        return jnp.where(x > radius, jnp.sqrt(jnp.maximum(x, LOSS_EPS)) - jnp.sqrt(radius), LOSS_EPS)

    @staticmethod
    def linearize(x, log_radius):
        radius = jnp.exp(log_radius)
        return jnp.where(x > radius, 1.0 / (2.0 * jnp.sqrt(jnp.maximum(x, LOSS_EPS)) + LOSS_EPS), 0.0)


class GemanMcClureLoss:
    """GNC-capable: mu from 1 (full Geman-McClure) to +inf (quadratic)."""

    is_gnc = True

    @staticmethod
    def evaluate(x, log_radius, mu=1.0):
        radius = jnp.exp(log_radius)
        return mu * radius * x / (mu * radius + x + LOSS_EPS)

    @staticmethod
    def linearize(x, log_radius, mu=1.0):
        radius = jnp.exp(log_radius)
        return (mu * radius) ** 2 / ((mu * radius + x) ** 2 + LOSS_EPS)
