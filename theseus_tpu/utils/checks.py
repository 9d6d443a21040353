"""Verification utilities: analytic-vs-autodiff jacobian checking and
manifold-aware numeric differentiation.

Re-designs of theseus/utils/utils.py: check_jacobians (:156),
numeric_jacobian (:83), numeric_grad (:121). In JAX the autodiff ground truth
is jacfwd through the retract parametrization, which is exact; finite
differences are also provided for independent verification."""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def numeric_jacobian(
    fn: Callable,
    groups: Sequence,
    elements: Sequence,
    h: float = 1e-6,
):
    """Central-difference jacobians of fn(elements)->(dim,) wrt each element's
    right tangent (retract-based, reference utils.py:83)."""
    jacs = []
    base = np.asarray(fn(tuple(elements)))
    for s, (g, x) in enumerate(zip(groups, elements)):
        cols = []
        for i in range(g.dof):
            e = np.zeros(g.dof)
            e[i] = h
            xp = g.retract(x, jnp.asarray(e))
            xm = g.retract(x, jnp.asarray(-e))
            ep = list(elements)
            ep[s] = xp
            em = list(elements)
            em[s] = xm
            cols.append((np.asarray(fn(tuple(ep))) - np.asarray(fn(tuple(em)))) / (2 * h))
        jacs.append(np.stack(cols, axis=-1))
    return jacs


def autodiff_jacobian(fn: Callable, groups: Sequence, elements: Sequence):
    """Exact tangent jacobians via jacfwd through retract at zero."""

    def at(deltas):
        retracted = tuple(
            g.retract(x, d) for g, x, d in zip(groups, elements, deltas)
        )
        return fn(retracted)

    zeros = tuple(jnp.zeros(g.dof, dtype=jnp.asarray(elements[0]).dtype) for g in groups)
    return list(jax.jacfwd(at)(zeros))


def check_jacobians(cost_function, num_checks: int = 1, tol: float = 1e-6,
                    key=None, verbose: bool = False) -> bool:
    """Compare a cost function's analytic jacobians against autodiff over
    randomized variable values (reference utils.py:156). Raises on mismatch."""
    if not cost_function.has_analytic_jacobians:
        return True
    key = key if key is not None else jax.random.PRNGKey(0)
    groups = [v.group for v in cost_function.optim_vars]
    aux = tuple(
        (a.tensor[0] if a.tensor is not None else None)
        for a in cost_function.aux_vars
    )
    if any(a is None for a in aux):
        raise ValueError("All aux vars need data for check_jacobians.")
    for chk in range(num_checks):
        key, *keys = jax.random.split(key, len(groups) + 1)
        elements = tuple(
            g.rand(k, dtype=jnp.float64) for g, k in zip(groups, keys)
        )
        jacs_a, err_a = cost_function.jacobians_impl(elements, aux)
        jacs_n = autodiff_jacobian(
            lambda optim: cost_function.error_impl(optim, aux), groups, elements
        )
        for s, (ja, jn) in enumerate(zip(jacs_a, jacs_n)):
            diff = np.abs(np.asarray(ja) - np.asarray(jn)).max()
            if verbose:
                print(f"check {chk} slot {s}: max diff {diff:.3e}")
            if diff > tol:
                raise RuntimeError(
                    f"Jacobian mismatch for {cost_function.name} optim var "
                    f"{s}: max abs diff {diff:.3e} > {tol:.1e}"
                )
    return True


def gather_from_rows_cols(matrix, rows, cols):
    """matrix (B, H, W), rows/cols (B, N) -> (B, N)
    (reference utils.py:64)."""
    return jax.vmap(lambda m, r, c: m[r, c])(matrix, rows, cols)


def build_mlp(hidden_sizes: Sequence[int], key, activation=jax.nn.relu):
    """Tiny MLP helper for learning-loop examples (reference utils.py:19):
    returns (params, apply_fn)."""
    keys = jax.random.split(key, len(hidden_sizes) - 1)
    params = []
    for k, (n_in, n_out) in zip(keys, zip(hidden_sizes[:-1], hidden_sizes[1:])):
        wk, bk = jax.random.split(k)
        scale = float(np.sqrt(2.0 / n_in))
        params.append(
            {
                "w": scale * jax.random.normal(wk, (n_in, n_out)),
                "b": jnp.zeros((n_out,)),
            }
        )

    def apply(params, x):
        for i, layer in enumerate(params):
            x = x @ layer["w"] + layer["b"]
            if i + 1 < len(params):
                x = activation(x)
        return x

    return params, apply
