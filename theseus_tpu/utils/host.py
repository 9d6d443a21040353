"""Host-side problem construction for remote-accelerator sessions.

Problem construction (objective build, compile, pack/build_aux) is host
bookkeeping plus a long tail of small eager array ops. On a directly
attached TPU those eager ops are microseconds; through a remote-tunnel
plugin (axon) EVERY one is a network RPC, and the tunnel shows
multi-minute slow episodes — measured 2026-08-20 at sphere2500 scale,
``bench.build`` in a fresh process cost 55 s / 93 s / 517 s across three
runs with identical inputs, with <4 s of actual host CPU time. The torch
reference has no analogue of this failure mode (eager CPU tensors all the
way; cf. /root/reference/theseus/core/objective.py construction path).

``on_host()`` pins JAX's default device to the LOCAL CPU backend for the
duration of construction, so every eager op stays on-machine, and
``to_device`` then uploads the finished pytree in one batched
``jax.device_put``. Under ``JAX_PLATFORMS=cpu`` (the test tier) both are
no-ops in effect: there is no remote device to avoid.

    with on_host():
        layer, state, aux = build_problem(...)
    state, aux = to_device((state, aux))

Note jit-compiled functions CALLED inside ``on_host()`` compile for CPU;
keep the context around construction only, not the solve.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["on_host", "to_device", "local_cpu"]


def local_cpu():
    """The local CPU device, or None if the backend is unavailable."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


@contextlib.contextmanager
def on_host():
    """Run eager JAX ops on the local CPU (no-op if no CPU backend)."""
    cpu = local_cpu()
    if cpu is None:
        yield
        return
    with jax.default_device(cpu):
        yield


def to_device(tree, device=None):
    """Batched upload of a pytree to ``device`` (default: default device).

    One ``jax.device_put`` call for the whole tree, instead of one
    transfer RPC per leaf as leaves are touched lazily.
    """
    if device is None:
        device = jax.devices()[0]
    moved = jax.device_put(tree, device)
    for leaf in jax.tree_util.tree_leaves(moved):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return moved
