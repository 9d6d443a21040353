"""User-facing variable ordering.

Reference: theseus/optimizer/variable_ordering.py:11 — an explicit
name -> column-index order of optimization variables, defaulting to the
objective's insertion order. In the TPU rebuild the ordering's practical role
is the **elimination order** of the block-sparse solver (column layout of the
dense path is fixed by the compiled schema), so a `VariableOrdering` can be
passed anywhere an ordering string ("nd" | "amd" | "rcm" | "natural") is
accepted: `LevenbergMarquardt(obj, ordering=my_ordering)`,
`SparseNormalBuilder(co, ordering=...)`.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Union

import numpy as np


class VariableOrdering:
    """Ordered list of optim-variable names (reference
    variable_ordering.py:11: append/remove/index bookkeeping, default =
    insertion order of the objective)."""

    def __init__(self, objective=None, default_order: bool = True,
                 names: Optional[Sequence[str]] = None):
        self.objective = objective
        self._names: List[str] = []
        if names is not None:
            for n in names:
                self.append(n)
        elif objective is not None and default_order:
            self._names.extend(objective.optim_vars.keys())

    # -- list-ish API (reference :30-70) --------------------------------
    def append(self, name: str) -> None:
        if name in self._names:
            raise ValueError(f"variable {name} already in ordering")
        if self.objective is not None and name not in self.objective.optim_vars:
            raise ValueError(f"variable {name} not in objective")
        self._names.append(name)

    def remove(self, name: str) -> None:
        self._names.remove(name)

    def extend(self, names: Iterable[str]) -> None:
        for n in names:
            self.append(n)

    def index_of(self, name: str) -> int:
        return self._names.index(name)

    @property
    def complete(self) -> bool:
        if self.objective is None:
            return True
        return set(self._names) == set(self.objective.optim_vars.keys())

    def __getitem__(self, i: int) -> str:
        return self._names[i]

    def __iter__(self):
        return iter(self._names)

    def __len__(self) -> int:
        return len(self._names)

    def names(self) -> List[str]:
        return list(self._names)

    # -- solver integration ---------------------------------------------
    def as_permutation(self, var_names: Sequence[str]) -> np.ndarray:
        """perm[k] = index (into var_names) of the k-th variable to
        eliminate. var_names is the compiled objective's column order."""
        index = {n: i for i, n in enumerate(var_names)}
        missing = [n for n in self._names if n not in index]
        if missing:
            raise ValueError(f"ordering names not in objective: {missing}")
        if len(self._names) != len(var_names):
            raise ValueError(
                f"ordering is incomplete: {len(self._names)} of "
                f"{len(var_names)} variables"
            )
        return np.array([index[n] for n in self._names], dtype=np.int64)


OrderingSpec = Union[str, VariableOrdering, Sequence[str], np.ndarray]


def resolve_ordering(ordering: OrderingSpec, var_names: Sequence[str]):
    """Normalize an ordering spec to what `symbolic_factor` accepts: a
    strategy string, or an explicit permutation array."""
    if isinstance(ordering, str):
        return ordering
    if isinstance(ordering, VariableOrdering):
        return ordering.as_permutation(var_names)
    if isinstance(ordering, np.ndarray):
        return np.asarray(ordering, dtype=np.int64)
    # sequence of names
    return VariableOrdering(names=list(ordering)).as_permutation(var_names)
