"""Objective: the mutable problem-graph builder.

Re-design of the reference Objective (theseus/core/objective.py:42). The
builder keeps user-facing bookkeeping (ordered cost functions, shared
variables by name, add/erase); all numerical work lives in the compiled view
(`compile()`), which is cached and invalidated on structural change — the JAX
analog of the reference's version counter (objective.py:111) combined with
its Vectorize hooks (objective.py:916).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import solver_precision
from .compiled import CompiledObjective, compile_objective
from .cost_function import CostFunction
from .variable import ManifoldVariable, Variable


class Objective:
    def __init__(self, dtype=jnp.float32):
        self.cost_functions: "OrderedDict[str, CostFunction]" = OrderedDict()
        self.optim_vars: Dict[str, ManifoldVariable] = {}
        self.var_families: Dict[str, "object"] = {}
        self.aux_vars: Dict[str, Variable] = {}
        self.dtype = dtype
        self._compiled: Optional[CompiledObjective] = None
        self.current_version = 0

    def _register_optim(self, v):
        fam = getattr(v, "family", None)
        if fam is not None:
            self.var_families[fam.name] = fam
            return
        existing = self.optim_vars.get(v.name)
        if existing is not None and existing is not v:
            if existing.group != v.group:
                raise ValueError(
                    f"Optim variable name clash with different groups: {v.name}"
                )
        self.optim_vars[v.name] = v
        if v.name in self.aux_vars:
            raise ValueError(f"{v.name} already registered as auxiliary.")

    def add(self, cost_function):
        """Add a CostFunction or a CostFamily (bulk; core/family.py)."""
        from .family import CostFamily

        if cost_function.name in self.cost_functions:
            raise ValueError(f"Duplicate cost function name {cost_function.name}")
        if isinstance(cost_function, CostFamily):
            for m in cost_function.members:
                if isinstance(m, tuple):
                    self.var_families[m[0].name] = m[0]
                else:
                    self._register_optim(m)
            aux = list(cost_function.template.aux_vars) + list(
                cost_function.template.weight.aux_vars
            )
        else:
            for v in cost_function.optim_vars:
                self._register_optim(v)
            aux = list(cost_function.aux_vars) + list(
                cost_function.weight.aux_vars
            )
        for a in aux:
            if a.name in self.optim_vars:
                raise ValueError(f"{a.name} already registered as optimization var.")
            self.aux_vars[a.name] = a
        self.cost_functions[cost_function.name] = cost_function
        self._compiled = None
        self.current_version += 1
        return self

    def erase(self, name: str):
        from .family import CostFamily

        def refs(c):
            """(optim names, family names, aux names) referenced by c."""
            if isinstance(c, CostFamily):
                ov = [m.name for m in c.members if not isinstance(m, tuple)]
                fams = [m[0].name for m in c.members if isinstance(m, tuple)]
                aux = list(c.template.aux_vars) + list(c.template.weight.aux_vars)
            else:
                ov = [v.name for v in c.optim_vars]
                fams = [
                    v.family.name
                    for v in c.optim_vars
                    if getattr(v, "family", None) is not None
                ]
                aux = list(c.aux_vars) + list(c.weight.aux_vars)
            return ov, fams, [a.name for a in aux]

        cf = self.cost_functions.pop(name)
        # drop variables that no longer appear anywhere
        still = set()
        for c in self.cost_functions.values():
            for group in refs(c):
                still.update(group)
        ov, fams, aux = refs(cf)
        for n in ov:
            if n not in still:
                self.optim_vars.pop(n, None)
        for n in fams:
            if n not in still:
                self.var_families.pop(n, None)
        for n in aux:
            if n not in still:
                self.aux_vars.pop(n, None)
        self._compiled = None
        self.current_version += 1
        return cf

    def has_cost_function(self, name: str) -> bool:
        return name in self.cost_functions

    def get_cost_function(self, name: str) -> Optional[CostFunction]:
        return self.cost_functions.get(name)

    def size_cost_functions(self) -> int:
        return len(self.cost_functions)

    def size_variables(self) -> int:
        return len(self.optim_vars)

    def size_aux_vars(self) -> int:
        return len(self.aux_vars)

    def dim(self) -> int:
        from .family import CostFamily

        return sum(
            cf.total_dim() if isinstance(cf, CostFamily) else cf.dim()
            for cf in self.cost_functions.values()
        )

    def compile(self, vectorize: Optional[bool] = None) -> CompiledObjective:
        """vectorize: True = schema-bucketed (default), False = one bucket
        per cost (Vectorize-off ablation analog).

        None means "whatever was explicitly chosen, else vectorized": an
        EXPLICIT compile(vectorize=False) is honored by later default-path
        calls (the optimizer/layer call compile() internally — recompiling
        to vectorized there would mismatch state/aux already packed for the
        unvectorized schema), but with a one-time warning so the large
        compile/runtime regression of staying unvectorized is never
        silent."""
        if vectorize is not None:
            self._explicit_vectorize = vectorize
        want = getattr(self, "_explicit_vectorize", None)
        if want is None:
            want = True
        # one-time "still unvectorized" warning on EVERY default path that
        # honors an explicit vectorize=False — including a fresh compile
        # after a structural change (add/erase resets _compiled to None),
        # not just the cache-reuse branch
        if vectorize is None and want is False and not getattr(
            self, "_warned_unvectorized", False
        ):
            import warnings

            warnings.warn(
                "reusing an explicitly-requested vectorize=False "
                "compilation from the default path; call "
                "compile(vectorize=True) to return to schema-bucketed "
                "vectorization",
                stacklevel=2,
            )
            self._warned_unvectorized = True
        if (
            self._compiled is not None
            and getattr(self._compiled, "_vectorized", True) == want
        ):
            return self._compiled
        self._compiled = compile_objective(self, vectorize=want)
        self._compiled._vectorized = want
        return self._compiled

    # ------------------------------------------------------------------
    def default_values(self, input_tensors: Optional[Dict] = None) -> Dict:
        """Merge stored variable defaults with user inputs into a full dict."""
        values = {}
        for n, v in self.optim_vars.items():
            values[n] = v.default(dtype=self.dtype)
        for n, fam in self.var_families.items():
            values[n] = fam.default(dtype=self.dtype)
        for n, a in self.aux_vars.items():
            if a.tensor is not None:
                values[n] = a.tensor
        if input_tensors:
            for n, t in input_tensors.items():
                # keep host arrays host-side: a per-name jnp.asarray is one
                # device_put round-trip EACH on a remote backend (2500 poses
                # = 2500 transfers); pack/build_aux stack host values in
                # numpy and move the result to the device in one transfer
                if isinstance(t, (np.ndarray, jnp.ndarray)):
                    values[n] = t
                else:
                    values[n] = np.asarray(t)
        missing = [
            n for n in self.optim_vars if n not in values or values[n] is None
        ]
        if missing:
            raise ValueError(f"No data for optimization variables {missing}")
        return values

    def error(self, values: Optional[Dict] = None, input_tensors: Optional[Dict] = None):
        """Weighted error vector (B, dim()) at given values."""
        co = self.compile()
        values = values or self.default_values(input_tensors)
        b = co.resolve_batch_size(values)
        state = co.pack(values, b)
        aux = co.build_aux(values, b)
        with solver_precision():
            return co.error(state, aux)

    def error_metric(self, values: Optional[Dict] = None, input_tensors: Optional[Dict] = None):
        """0.5*||e||^2 per batch element."""
        co = self.compile()
        values = values or self.default_values(input_tensors)
        b = co.resolve_batch_size(values)
        state = co.pack(values, b)
        aux = co.build_aux(values, b)
        with solver_precision():
            return co.error_metric(state, aux)
