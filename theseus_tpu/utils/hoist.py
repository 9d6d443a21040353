"""Constant-hoisting jit: gather/index tables as runtime parameters.

The sparse solver's symbolic plan (cholesky.py NumericSchedule, Schur
tables, assembly gather schedules) is host numpy converted with
``jnp.asarray`` at trace time, so a plain ``jax.jit`` embeds every table as
an inline HLO literal. Measured at sphere2500 scale the literals are 74% of
the program text (1.28 MB of 1.74 MB); at BA 256x8000 they crash the remote
TPU compiler outright (dense-W SIGABRT) or exceed the compile-RPC body
limit (sparse-W 413) — see BENCH_SWEEP.md. The reference has no analogue of
this failure mode because torch executes eagerly; first-call latency is the
one UX axis where a traced design regresses, so program size is a
first-class defect here.

``hoist_jit`` is a drop-in for ``jax.jit`` on pure pytree->pytree functions
that lifts large jaxpr constants into runtime arguments:

    trace once with jax.make_jaxpr      -> closed.consts holds the tables
    dedup consts by content             -> identical tables (the solver
                                           reuses several) upload once
    re-emit via jax.core.eval_jaxpr     -> consts become function PARAMETERS
    jax.jit the converted callable      -> HLO carries no big literals

jax.closure_convert does not do this in current JAX (it hoists only outer
tracers, returning [] for numpy/device-array constants — verified on 0.9.0).

Gradients, scans, while loops, custom_jvp/vjp and pallas_call eqns replay
through eval_jaxpr unchanged; outer jax.grad of the wrapped callable
differentiates the replayed eqns exactly as it would the original (pinned
by tests/utils/test_hoist.py).

Costs: one extra abstract trace per input signature (the make_jaxpr pass)
and one host->device upload of the deduped tables per signature; per-call
overhead is only the argument plumbing. Tables arrive as parameters, which
denies XLA constant-specific folds (e.g. turning a constant gather into
slices); the bench gate A/Bs this on hardware — measured neutral on the
flagship (BENCH_SWEEP.md round-5 section).
"""

from __future__ import annotations

import hashlib
import warnings
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import core, tree_util


def _content_key(x) -> Tuple:
    a = np.asarray(x)
    return (str(a.dtype), a.shape, hashlib.sha1(a.tobytes()).hexdigest())


class _Entry:
    __slots__ = ("call", "hoisted")

    def __init__(self, call, hoisted):
        self.call = call
        self.hoisted = hoisted


def hoist_jit(fn: Callable, *, min_bytes: int = 4096) -> Callable:
    """jit(fn) with large trace-time constants passed as runtime args.

    fn must be a pure function of positional pytree arguments (no static
    arguments — close over those before wrapping). Honors
    config.HOIST_CONSTANTS at call time; on any failure to convert, falls
    back to plain jax.jit with a one-shot warning.
    """
    plain = jax.jit(fn)
    cache: Dict[Any, _Entry] = {}
    failed = [False]

    def wrapped(*args):
        from .. import config as _config

        if failed[0] or not getattr(_config, "HOIST_CONSTANTS", True):
            return plain(*args)

        flat, treedef = tree_util.tree_flatten(args)
        # abstractify without touching device buffers (np.asarray here would
        # force a D2H copy of the whole state every call)
        avals = tuple(
            (
                str(getattr(x, "dtype", None) or np.asarray(x).dtype),
                np.shape(x),
                bool(getattr(x, "weak_type", False)),
            )
            for x in flat
        )
        key = (treedef, avals)
        entry = cache.get(key)
        if entry is None:
            try:
                entry = _build(fn, args, flat, treedef, min_bytes)
            except Exception as e:  # pragma: no cover - safety net
                warnings.warn(
                    f"hoist_jit: constant hoisting failed ({type(e).__name__}: "
                    f"{e}); falling back to plain jit for this function"
                )
                failed[0] = True
                return plain(*args)
            cache[key] = entry
        return entry.call(entry.hoisted, *flat)

    def lower(*args):
        """AOT mirror of jax.jit(fn).lower(*args) with the same hoisting.

        Returns a shim whose .compile() yields a callable taking the
        ORIGINAL args (the hoisted tables are bound internally) and
        exposing cost_analysis()/as_text() — what the bench harnesses
        need to compile exactly once per executable on the remote TPU
        (the 205k-cost BA programs are heavy enough that a duplicate
        compile drops the tunnel connection)."""
        from .. import config as _config

        if failed[0] or not getattr(_config, "HOIST_CONSTANTS", True):
            return plain.lower(*args)
        flat, treedef = tree_util.tree_flatten(args)
        avals = tuple(
            (
                str(getattr(x, "dtype", None) or np.asarray(x).dtype),
                np.shape(x),
                bool(getattr(x, "weak_type", False)),
            )
            for x in flat
        )
        key = (treedef, avals)
        entry = cache.get(key)
        if entry is None:
            try:
                entry = _build(fn, args, flat, treedef, min_bytes)
            except Exception as e:  # pragma: no cover - safety net
                warnings.warn(
                    f"hoist_jit: constant hoisting failed ({type(e).__name__}:"
                    f" {e}); falling back to plain jit for this function"
                )
                failed[0] = True
                return plain.lower(*args)
            cache[key] = entry
        return _LoweredShim(
            entry.call.lower(entry.hoisted, *flat), entry.hoisted
        )

    wrapped.__wrapped__ = fn
    wrapped.lower = lower
    return wrapped


class _LoweredShim:
    """Mirrors jax.stages.Lowered for a hoisted function."""

    def __init__(self, lowered, hoisted):
        self._lowered = lowered
        self._hoisted = hoisted

    def as_text(self, *a, **kw):
        return self._lowered.as_text(*a, **kw)

    def compile(self, *a, **kw):
        return _CompiledShim(self._lowered.compile(*a, **kw), self._hoisted)


class _CompiledShim:
    """Mirrors jax.stages.Compiled: call with the ORIGINAL args."""

    def __init__(self, compiled, hoisted):
        self._compiled = compiled
        self._hoisted = hoisted

    def __call__(self, *args):
        flat, _ = tree_util.tree_flatten(args)
        return self._compiled(self._hoisted, *flat)

    def cost_analysis(self):
        return self._compiled.cost_analysis()

    def as_text(self, *a, **kw):
        return self._compiled.as_text(*a, **kw)

    def memory_analysis(self):
        return self._compiled.memory_analysis()


def _local_cpu():
    from .host import local_cpu

    return local_cpu()


def _build(fn, args, flat, treedef, min_bytes) -> _Entry:
    def flat_fn(*leaves):
        return fn(*tree_util.tree_unflatten(treedef, leaves))

    # Trace with the LOCAL CPU as the default device: the solver builds its
    # symbolic tables with jnp.asarray at trace time, and each such concrete
    # constant otherwise lands on the session's default device. Under the
    # axon remote plugin that is one tunnel round-trip per table (~4 s each,
    # measured 2026-08-20) — pinning the trace to local CPU cut the
    # sphere2500 lower() from 36.6 s to host-speed (see BENCH_SWEEP.md
    # first-call decomposition). Abstract tracing itself is device-agnostic,
    # so the emitted jaxpr is identical.
    cpu = _local_cpu()
    if cpu is not None:
        with jax.default_device(cpu):
            closed, out_shape = jax.make_jaxpr(flat_fn, return_shape=True)(
                *flat
            )
    else:
        closed, out_shape = jax.make_jaxpr(flat_fn, return_shape=True)(*flat)
    out_tree = tree_util.tree_structure(out_shape)
    consts = list(closed.consts)

    # split: big constants become runtime args (deduped by content so the
    # solver's repeated tables upload once); small ones stay baked
    uniq: Dict[Tuple, int] = {}
    hoisted_arrays = []
    spec = []  # per-const: ('baked', value) | ('hoisted', uniq_index)
    for c in consts:
        a = np.asarray(c)
        if a.nbytes < min_bytes:
            # numpy, not a (possibly CPU-committed) jax.Array: embeds as a
            # plain literal in the converted jaxpr with no device affinity
            spec.append(("baked", a))
            continue
        k = _content_key(a)
        idx = uniq.get(k)
        if idx is None:
            idx = len(hoisted_arrays)
            uniq[k] = idx
            hoisted_arrays.append(a)
        spec.append(("hoisted", idx))
    # one batched upload of the deduped tables to the session's default
    # device (per-array jnp.asarray would be one tunnel RPC each under axon)
    hoisted = tuple(jax.device_put(hoisted_arrays))

    jaxpr = closed.jaxpr

    def converted(hoisted_args, *leaves):
        full = [
            v if kind == "baked" else hoisted_args[v] for kind, v in spec
        ]
        out_flat = core.eval_jaxpr(jaxpr, full, *leaves)
        return tree_util.tree_unflatten(out_tree, out_flat)

    return _Entry(jax.jit(converted), hoisted)
