"""DCEM: differentiable cross-entropy-method optimizer.

Re-design of the reference DCEM (theseus/optimizer/nonlinear/dcem.py:26):
per-iteration, sample n_sample Gaussians around the current mean in RAW
variable coordinates (matching the reference's concatenated-tensor sampling),
evaluate the objective for every sample with one extra vmap axis (the
reference loops in Python), select a soft elite set with the differentiable
LML layer, and update mean/sigma. The whole loop is one lax.scan, so the
optimizer is differentiable end to end (the reference unrolls in Python)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import solver_precision
from .lml import lml
from .nonlinear import NLSOptions, NonlinearLeastSquares, OptimizerInfo


@dataclasses.dataclass(frozen=True)
class DCEMOptions:
    max_iterations: int = 50
    n_sample: int = 100
    n_elite: int = 5
    temp: float = 1.0
    init_sigma: float = 1.0
    lml_eps: float = 1e-3
    normalize: bool = True
    abs_err_tolerance: float = 1e-6
    rel_err_tolerance: float = 1e-4
    track_err_history: bool = True


class DCEM:
    def __init__(self, objective, **kwargs):
        self.objective = objective
        self.opts = DCEMOptions(**kwargs)

    @property
    def compiled(self):
        return self.objective.compile()

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

        if opts.n_elite == 1:
            w = jax.nn.softmax(-nfx * opts.temp, axis=1)
        else:
            w = lml(-nfx * opts.temp, opts.n_elite)
        w = w[..., None]  # (B, S, 1)

        xs_b = jnp.moveaxis(xs, 0, 1)  # (B, S, R)
        new_mu = jnp.sum(w * xs_b, axis=1) / opts.n_elite
        new_sigma = jnp.sqrt(
            jnp.sum(w * (xs_b - new_mu[:, None]) ** 2, axis=1) / opts.n_elite
        )
        return new_mu, new_sigma

    def solve(self, state, aux, key, opts: Optional[DCEMOptions] = None):
        """Pure jittable solve: returns final carry dict."""
        opts = opts or self.opts
        co = self.compiled
        with solver_precision():
            mu0 = co.flatten_raw(state)
            b = mu0.shape[0]
            err0 = co.error_metric(state, aux)
            sigma0 = jnp.full_like(mu0, opts.init_sigma)
            hist0 = jnp.full((opts.max_iterations + 1, b), jnp.nan, mu0.dtype)

            def body(carry, key_i):
                mu, sigma, err, done, conv_it, it = carry
                new_mu, new_sigma = self._cem_step(co, mu, sigma, aux, key_i, opts)
                new_err = co.error_metric(co.unflatten_raw(new_mu), aux)
                mu = jnp.where(done[:, None], mu, new_mu)
                sigma = jnp.where(done[:, None], sigma, new_sigma)
                err_out = jnp.where(done, err, new_err)
                change = jnp.abs(err - err_out)
                denom = jnp.where(err == 0, 1.0, err)
                conv = (change < opts.abs_err_tolerance) | (
                    jnp.abs(change / denom) < opts.rel_err_tolerance
                )
                it = it + 1
                conv_it = jnp.where(conv & (conv_it < 0) & ~done, it, conv_it)
                done = done | conv
                return (mu, sigma, err_out, done, conv_it, it), err_out

            keys = jax.random.split(key, opts.max_iterations)
            init = (
                mu0,
                sigma0,
                err0,
                jnp.zeros((b,), bool),
                jnp.full((b,), -1, jnp.int32),
                jnp.zeros((), jnp.int32),
            )
            (mu, sigma, err, done, conv_it, _), errs = jax.lax.scan(body, init, keys)
            hist = hist0.at[0].set(err0).at[1:].set(errs)
            return {
                "state": co.unflatten_raw(mu),
                "sigma": sigma,
                "err": err,
                "done": done,
                "converged_iter": conv_it,
                "history": hist,
            }

    def optimize(self, values=None, input_tensors=None, key=None, **kwargs):
        from .nonlinear import NonlinearOptimizerStatus

        co = self.compiled
        values = values or self.objective.default_values(input_tensors)
        b = co.resolve_batch_size(values)
        state = co.pack(values, b)
        aux = co.build_aux(values, b)
        key = key if key is not None else jax.random.PRNGKey(0)
        opts = dataclasses.replace(self.opts, **kwargs) if kwargs else self.opts
        carry = jax.jit(
            lambda s, a, k: self.solve(s, a, k, opts)
        )(state, aux, key)
        status = jnp.where(
            carry["done"],
            NonlinearOptimizerStatus.CONVERGED,
            NonlinearOptimizerStatus.MAX_ITERATIONS,
        ).astype(jnp.int8)
        info = OptimizerInfo(
            status=status,
            converged_iter=carry["converged_iter"],
            best_err=carry["err"],
            last_err=carry["err"],
            err_history=carry["history"],
        )
        out = dict(values)
        out.update(co.unpack(carry["state"]))
        return out, info
