"""Mesh sharding for batched NLLS problems.

The reference has no distributed path (SURVEY.md §2.9: no NCCL/MPI anywhere);
its scaling axes are batch size and problem size. The TPU-native analog is
free multi-chip scaling of the *batch* axis via `jax.sharding`: every state
array is (N_instances, B, *elem), every stacked aux array is (K, B, *shape)
and every shared aux array is (B, *shape), so sharding B over a device mesh
("dp") turns the whole inner loop into per-chip independent solves with zero
collectives — only the outer-loop loss reduction crosses chips (one psum
inserted by XLA). Larger-than-chip single problems would instead shard the
residual/variable axes; helpers for that live with the sparse solver.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.compiled import CompiledObjective


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}) needs {n} devices but platform "
            f"'{jax.default_backend()}' has {len(devs)}; for CPU testing set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
            f"jax initializes"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def state_pspecs(co: CompiledObjective, axis: str = "dp"):
    """PartitionSpec pytree matching `co.pack(...)`: shard the batch axis."""
    return {tk: P(None, axis) for tk in co.type_members}


def aux_pspecs(co: CompiledObjective, axis: str = "dp"):
    """PartitionSpec pytree matching `co.build_aux(...)` structurally:
    stacked slots are (K, B, ...), shared slots are (B, ...)."""
    out = []
    for bk in co.buckets:
        def spec_for(slots):
            return tuple(P(axis) if s.shared else P(None, axis) for s in slots)

        out.append((spec_for(bk.aux_slots), spec_for(bk.weight_slots)))
    return tuple(out)


def carry_pspecs(co: CompiledObjective, carry_like, axis: str = "dp"):
    """PartitionSpec pytree matching an optimizer solve carry dict.

    `carry_like` is the carry itself or its eval_shape: state stacks are
    (N_t, B, ...) -> P(None, axis); err history is (iters+1, B) ->
    P(None, axis); the iteration counter is a replicated scalar; every other
    per-batch leaf (err/done/fail/damping/...) is (B,) -> P(axis)."""
    specs = {}
    for k, v in carry_like.items():
        if k == "state":
            specs[k] = {tk: P(None, axis) for tk in v}
        elif k == "history":
            specs[k] = P(None, axis)
        elif k == "it":
            specs[k] = P()
        else:
            specs[k] = P(axis)
    return specs


def shard_map_solve(layer, mesh: Mesh, mode: str = "implicit", opts=None,
                    axis: str = "dp", **solve_kwargs):
    """Wrap a TheseusLayer solve in `jax.shard_map` over the batch axis.

    Plain jit-with-sharded-inputs already scales the pure-JAX path (XLA
    propagates the dp sharding through the whole solve with zero
    collectives); shard_map is the plumbing the *Pallas fused kernels* need:
    inside shard_map every pallas_call sees per-shard local arrays, so the
    Mosaic grid/BlockSpecs work unchanged on each chip. Returns
    solve(state, aux) -> carry; inputs must be (or will be interpreted as)
    batch-sharded per `state_pspecs`/`aux_pspecs`."""
    co = layer.objective.compile()
    opts = opts or layer.optimizer.opts

    def local_solve(state, aux):
        return layer.solve_state(state, aux, mode, opts, **solve_kwargs)

    def solve(state, aux):
        carry_shape = jax.eval_shape(local_solve, state, aux)
        return jax.shard_map(
            local_solve,
            mesh=mesh,
            in_specs=(state_pspecs(co, axis), aux_pspecs(co, axis)),
            out_specs=carry_pspecs(co, carry_shape, axis),
            check_vma=False,  # the per-shard iteration counter may diverge
        )(state, aux)

    return solve


def shard_problem(co: CompiledObjective, state, aux, mesh: Mesh, axis: str = "dp"):
    """Place state/aux on the mesh with batch-axis sharding."""
    sspec = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), state_pspecs(co, axis)
    )
    aspec = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        aux_pspecs(co, axis),
        is_leaf=lambda x: isinstance(x, P),
    )
    state = jax.tree_util.tree_map(jax.device_put, state, sspec)
    aux = jax.tree_util.tree_map(jax.device_put, aux, aspec)
    return state, aux


def shard_gbp_factors(normal, mesh: Mesh, axis: str = "factors"):
    """Problem-axis sharding for GBP (beyond reference — SURVEY §2.9 has no
    distributed analog): place each factor-message array (K, B, ...) with its
    FACTOR axis K split over the mesh. One synchronous sweep is one batched
    step over every factor, so computation partitions by factor while XLA
    inserts the belief-aggregation collectives (the per-variable
    scatter-adds become local scatter + all-reduce). Buckets whose K does
    not divide the mesh are replicated (e.g. the single prior cost).

    Returns a new GBPNormal with the same builder; run the solve under
    `with mesh:` for parity with the unsharded program."""
    from ..optim.gbp import GBPNormal

    n_dev = len(mesh.devices.flat)

    def put(leaf):
        if leaf.shape[0] % n_dev == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    lams = tuple(
        tuple(tuple(put(b) for b in row) for row in lam_b)
        for lam_b in normal.lams
    )
    etas = tuple(tuple(put(e) for e in eta_b) for eta_b in normal.etas)
    return GBPNormal(normal.builder, lams, etas, normal.dtype, normal.bsz)
