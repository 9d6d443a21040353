"""DCEM: differentiable cross-entropy-method optimizer.

Re-design of the reference DCEM (theseus/optimizer/nonlinear/dcem.py:26):
per-iteration, sample n_sample Gaussians around the current mean in RAW
variable coordinates (matching the reference's concatenated-tensor sampling),
evaluate the objective for every sample with one extra vmap axis (the
reference loops in Python), select an elite set — soft via the
differentiable LML layer, or hard top-k when `temp=None` (reference
dcem.py:135-141) — and update mean/sigma.

DCEM subclasses NonlinearLeastSquares' carry protocol (init_carry /
iteration / run_scan / run_while), so `TheseusLayer(DCEM(obj))` works with
the unroll and truncated backward modes, mirroring the reference where DCEM
plugs into TheseusLayer by subclassing NonlinearOptimizer (dcem.py:26,160).
Gradient-based modes (implicit/dlm) need a linearization and are rejected.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import solver_precision
from .lml import lml
from .nonlinear import NLSOptions, NonlinearLeastSquares, OptimizerInfo


@dataclasses.dataclass(frozen=True)
class DCEMOptions(NLSOptions):
    max_iterations: int = 50
    abs_err_tolerance: float = 1e-6
    rel_err_tolerance: float = 1e-4
    n_sample: int = 100
    n_elite: int = 5
    temp: Optional[float] = 1.0  # None -> hard top-k elite selection
    init_sigma: float = 1.0
    lml_eps: float = 1e-3
    normalize: bool = True


class DCEM(NonlinearLeastSquares):
    method = "dcem"
    supported_modes = ("unroll", "truncated")

    def __init__(self, objective, key=None, **kwargs):
        self.objective = objective
        self.linear_solver = None
        self.linearization = "dense"
        self.ordering = "nd"
        self.eliminate = None
        self.sparse_solver = "direct"
        self.pcg_iters = 100
        self.end_iter_callback = kwargs.pop("end_iter_callback", None)
        self._normal_builder = None
        self._jit_cache = {}
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self.opts = DCEMOptions(**kwargs)

    def _init_scalar_state(self, opts) -> float:
        return 0.0  # no damping/trust-region state

    # -- carry protocol --------------------------------------------------
    def init_carry(self, state, aux, opts: DCEMOptions, batch_ignore_mask=None,
                   key=None):
        carry = super().init_carry(state, aux, opts, batch_ignore_mask)
        co = self.compiled
        mu = co.flatten_raw(state)
        carry["mu"] = mu
        carry["sigma"] = jnp.full_like(mu, opts.init_sigma)
        carry["key"] = key if key is not None else self._key
        return carry

    def _elite_weights(self, nfx, opts: DCEMOptions):
        """(B, S) costs -> (B, S) elite weights summing to n_elite."""
        if opts.temp is None:
            # hard top-k indicator (reference dcem.py:135-141); selection is
            # non-differentiable, values behind it still carry gradients
            _, idx = jax.lax.top_k(-nfx, opts.n_elite)  # (B, k)
            return jax.nn.one_hot(idx, nfx.shape[1], dtype=nfx.dtype).sum(axis=1)
        if opts.n_elite == 1:
            return jax.nn.softmax(-nfx * opts.temp, axis=1)
        return lml(-nfx * opts.temp, opts.n_elite)

    def _cem_step(self, co, mu, sigma, aux, key, opts: DCEMOptions):
        b, r = mu.shape
        noise = jax.random.normal(key, (opts.n_sample, b, r), dtype=mu.dtype)
        xs = mu[None] + sigma[None] * noise  # (S, B, R)

        def metric(x):
            return co.error_metric(co.unflatten_raw(x), aux)

        fx = jax.vmap(metric)(xs)  # (S, B)
        fx = jnp.moveaxis(fx, 0, 1)  # (B, S)

        if opts.normalize:
            fmu = jnp.mean(fx, axis=1, keepdims=True)
            fsig = jnp.std(fx, axis=1, keepdims=True)
            nfx = (fx - fmu) / (fsig + 1e-6)
        else:
            nfx = fx

        w = self._elite_weights(nfx, opts)[..., None]  # (B, S, 1)
        xs_b = jnp.moveaxis(xs, 0, 1)  # (B, S, R)
        new_mu = jnp.sum(w * xs_b, axis=1) / opts.n_elite
        new_sigma = jnp.sqrt(
            jnp.sum(w * (xs_b - new_mu[:, None]) ** 2, axis=1) / opts.n_elite
        )
        return new_mu, new_sigma

    def _iteration_inner(self, carry, aux, opts: DCEMOptions,
                         detach_hessian=False, force_update=False,
                         step_size=None):
        co = self.compiled
        key, sub = jax.random.split(carry["key"])
        mu, sigma = carry["mu"], carry["sigma"]
        new_mu, new_sigma = self._cem_step(co, mu, sigma, aux, sub, opts)
        new_err = co.error_metric(co.unflatten_raw(new_mu), aux)

        bad = ~jnp.isfinite(new_err)
        active = ~carry["done"] & ~bad
        do_update = active | jnp.asarray(force_update)
        mu = jnp.where(do_update[:, None], new_mu, mu)
        sigma = jnp.where(do_update[:, None], new_sigma, sigma)
        err = jnp.where(do_update, new_err, carry["err"])

        change = carry["err"] - err
        denom = jnp.where(carry["err"] == 0, 1.0, carry["err"])
        conv = (jnp.abs(change) < opts.abs_err_tolerance) | (
            jnp.abs(change / denom) < opts.rel_err_tolerance
        )
        newly_converged = conv & do_update
        it = carry["it"] + 1
        converged_iter = jnp.where(
            newly_converged & (carry["converged_iter"] < 0) & ~carry["done"],
            it,
            carry["converged_iter"],
        )
        out = {
            "state": co.unflatten_raw(mu),
            "mu": mu,
            "sigma": sigma,
            "key": key,
            "err": err,
            "done": carry["done"] | newly_converged,
            "ignore": carry["ignore"],
            "fail": carry["fail"] | (bad & ~carry["done"]),
            "damping": carry["damping"],
            "it": it,
            "converged_iter": converged_iter,
            "best_err": jnp.minimum(carry["best_err"], err),
        }
        if "history" in carry:
            out["history"] = carry["history"].at[it].set(err)
        if "state_history" in carry:
            out["state_history"] = jax.tree_util.tree_map(
                lambda h, s: h.at[it].set(s), carry["state_history"], out["state"]
            )
        return out

    # -- standalone API (kept for parity with round-1 users) -------------
    def solve(self, state, aux, key=None, opts: Optional[DCEMOptions] = None,
              batch_ignore_mask=None):
        """Pure jittable solve: returns final carry dict."""
        opts = opts or self.opts
        with solver_precision():
            carry = self.init_carry(state, aux, opts, batch_ignore_mask, key=key)
            return self.run_scan(carry, aux, opts.max_iterations, opts)

    def optimize(self, values=None, input_tensors=None, key=None, **kwargs):
        from .nonlinear import NonlinearOptimizerStatus

        co = self.compiled
        values = values or self.objective.default_values(input_tensors)
        b = co.resolve_batch_size(values)
        state = co.pack(values, b)
        aux = co.build_aux(values, b)
        key = key if key is not None else self._key
        opts = dataclasses.replace(self.opts, **kwargs) if kwargs else self.opts

        cache_key = (co, opts)
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            from ..utils.hoist import hoist_jit

            fn = hoist_jit(lambda s, a, k: self.solve(s, a, k, opts))
            self._jit_cache[cache_key] = fn
        carry = fn(state, aux, key)
        info = self.make_info(carry, opts)
        out = dict(values)
        out.update(co.unpack(carry["state"]))
        return out, info
