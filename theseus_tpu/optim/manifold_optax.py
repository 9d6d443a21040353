"""Manifold-aware first-order updates for outer-loop learning.

The TPU-native analog of the reference's LieGroupTensor + enable_lie_tangent
trick (theseus/geometry/utils.py:14-59), which overrides in-place torch ops
so Adam/SGD update Lie-valued parameters by retraction. Here the same idea is
an optax gradient transformation: gradients on group-valued leaves are pulled
back to the tangent space, the wrapped optimizer runs there, and the update
is applied with `retract`."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None

from ..lie import Group


def manifold_update(group: Group, param, egrad, step_size: float):
    """One manifold SGD step: retract(g, -lr * egrad_to_tangent(g, egrad))."""
    tangent_grad = group.egrad_to_tangent(param, egrad)
    return group.retract(param, -step_size * tangent_grad)


def lie_optimizer(groups: Dict[str, Group], tx):
    """Wrap an optax transformation so leaves named in `groups` live on their
    manifold: grads are projected to the tangent space, tx produces tangent
    updates, and apply_updates retracts.

    Usage:
        tx = lie_optimizer({"pose": lie.SE3}, optax.adam(1e-2))
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        params = tx.apply(params, updates)
    """
    if optax is None:
        raise ImportError("optax is required for lie_optimizer")

    def project(grads, params):
        out = dict(grads)
        for k, g in groups.items():
            out[k] = g.egrad_to_tangent(params[k], grads[k])
        return out

    def tangent_zero(params):
        out = {k: v for k, v in params.items()}
        for k, g in groups.items():
            batch = params[k].shape[: params[k].ndim - len(g.shape)]
            out[k] = jnp.zeros(batch + (g.dof,), params[k].dtype)
        return out

    class LieTx:
        def init(self, params):
            return tx.init(tangent_zero(params))

        def update(self, grads, state, params):
            tgrads = project(grads, params)
            return tx.update(tgrads, state, tangent_zero(params))

        def apply(self, params, updates):
            out = dict(params)
            for k, v in params.items():
                if k in groups:
                    out[k] = groups[k].retract(v, updates[k])
                else:
                    out[k] = v + updates[k]
            return out

    return LieTx()
