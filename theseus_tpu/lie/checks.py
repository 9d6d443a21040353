"""Eager-time validation contexts for Lie-group inputs.

Parity with the reference's thread-local check machinery
(theseus/geometry/lie_group_check.py:10,39,74,86 and torchlie
functional/check_contexts.py:12-44). Under jit, data-dependent validation
cannot raise, so — like torchlie, where checks must be off under vmap —
checks here run only on concrete (non-traced) arrays; inside traces they are
no-ops. Default follows torchlie: OFF."""

from __future__ import annotations

import threading
from typing import Optional

import jax.core
import numpy as np

_state = threading.local()


def checks_enabled() -> bool:
    return getattr(_state, "enabled", False)


class set_lie_group_check_enabled:
    """Context manager / callable to toggle input validation."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.prev = checks_enabled()
        _state.enabled = enabled

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        _state.enabled = self.prev
        return False


class no_lie_group_check(set_lie_group_check_enabled):
    def __init__(self):
        super().__init__(False)


class enable_checks(set_lie_group_check_enabled):
    def __init__(self):
        super().__init__(True)


# reference-name alias (theseus/__init__.py exports enable_lie_group_check)
enable_lie_group_check = enable_checks


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def check_group(group, tensor, atol: Optional[float] = None) -> None:
    """Raise if `tensor` is not a valid element of `group` (concrete arrays
    only; silently skipped under tracing, where raising is impossible)."""
    if not checks_enabled() or not _is_concrete(tensor):
        return
    ok = np.asarray(group.mod.check_group_tensor(tensor)) if hasattr(
        group.mod, "check_group_tensor"
    ) else True
    if not np.all(ok):
        raise ValueError(
            f"Invalid {group.name} element(s): "
            f"{int(np.size(ok) - np.count_nonzero(ok))} of {np.size(ok)} "
            "failed the group constraint check."
        )
