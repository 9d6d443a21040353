"""Variables: named handles binding a manifold type (or raw tensor) to data.

Re-design of the reference's Variable/Manifold split (theseus/core/variable.py:14,
theseus/geometry/manifold.py:31). In the functional JAX architecture a Variable
is a *spec* (name + manifold group + default value); per-step data lives in a
plain `{name: (B, *shape)}` dict that flows through jitted functions. There is
no update-counter machinery: structure changes trigger re-compilation (the JAX
analog of the reference's version guard, core/objective.py:111).
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..lie import Group, by_name, euclidean
from ..lie import group as _groupmod

_counter = itertools.count()


def _auto_name(prefix: str) -> str:
    return f"{prefix}__{next(_counter)}"


class Variable:
    """An auxiliary (non-optimized) named tensor of shape (B, *shape)."""

    def __init__(self, tensor=None, name: Optional[str] = None):
        self.name = name or _auto_name(type(self).__name__)
        # numpy/jax arrays are stored AS GIVEN: a Variable is a spec, and
        # converting host data here would pay one device_put per variable —
        # on a remote TPU backend that made building a 6k-cost objective take
        # minutes. Device conversion happens at pack/build_aux time.
        if tensor is None or isinstance(tensor, (np.ndarray, jnp.ndarray)):
            self.tensor = tensor
        else:
            self.tensor = jnp.asarray(tensor)

    @property
    def shape(self):
        return None if self.tensor is None else self.tensor.shape

    def __repr__(self):
        return f"{type(self).__name__}(name={self.name}, shape={self.shape})"


class ManifoldVariable(Variable):
    """An optimization variable living on a manifold `group`."""

    def __init__(self, group: Group, tensor=None, name: Optional[str] = None):
        super().__init__(tensor=tensor, name=name)
        self.group = group
        if self.tensor is not None:
            expect = group.shape
            if tuple(self.tensor.shape[-len(expect):]) != tuple(expect):
                raise ValueError(
                    f"{group.name} variable expects trailing shape {expect}, "
                    f"got {self.tensor.shape}"
                )
            if self.tensor.ndim == len(expect):
                self.tensor = self.tensor[None]  # add batch dim
            from ..lie.checks import check_group

            check_group(group, self.tensor)

    @property
    def dof(self) -> int:
        return self.group.dof

    def default(self, dtype=jnp.float32):
        if self.tensor is not None:
            return self.tensor
        return self.group.identity(1, dtype=dtype)

    # -- euclidean arithmetic surface (reference geometry/vector.py:73-188,
    # point_types.py:32-59): Vector/Point2/Point3 support elementwise
    # arithmetic and inner products, returning new euclidean variables.
    # Host (numpy) operands stay host-side — no device dispatch at build.
    @property
    def _is_euclidean(self) -> bool:
        return self.group.name.startswith("Rn")

    def _euclid_data(self, other):
        if not self._is_euclidean:
            raise TypeError(
                f"arithmetic is only defined for euclidean variables, "
                f"not {self.group.name}; use the lie ops / LieArray API"
            )
        if isinstance(other, ManifoldVariable):
            if not other._is_euclidean:
                raise TypeError("cannot combine euclidean and Lie variables")
            other = other.tensor
        return self.tensor, other

    def _wrap(self, data):
        return ManifoldVariable(euclidean(int(data.shape[-1])), data)

    def __add__(self, other):
        a, b = self._euclid_data(other)
        return self._wrap(a + b)

    __radd__ = __add__

    def __sub__(self, other):
        a, b = self._euclid_data(other)
        return self._wrap(a - b)

    def __rsub__(self, other):
        a, b = self._euclid_data(other)
        return self._wrap(b - a)

    def __mul__(self, other):
        a, b = self._euclid_data(other)
        return self._wrap(a * b)

    __rmul__ = __mul__

    def __truediv__(self, other):
        a, b = self._euclid_data(other)
        return self._wrap(a / b)

    def __neg__(self):
        a, _ = self._euclid_data(None)
        return self._wrap(-a)

    def __abs__(self):
        a, _ = self._euclid_data(None)
        return self._wrap(abs(a))

    def __matmul__(self, matrix):
        a, m = self._euclid_data(matrix)
        out = (a[:, None, :] @ m)[:, 0, :] if m.ndim == 3 else a @ m
        return self._wrap(out)

    def dot(self, other):
        """Batched inner product -> (B,) array (reference vector.py:150)."""
        a, b = self._euclid_data(other)
        return (a * b).sum(-1)

    inner = dot

    def outer(self, other):
        """Batched outer product -> (B, dof, dof) array."""
        a, b = self._euclid_data(other)
        return a[..., :, None] * b[..., None, :]

    def norm(self, **kwargs):
        a, _ = self._euclid_data(None)
        lin = jnp.linalg if isinstance(a, jnp.ndarray) else np.linalg
        return lin.norm(a, axis=-1, **kwargs)

    @staticmethod
    def cat(vectors, name: Optional[str] = None) -> "ManifoldVariable":
        """Concatenate euclidean variables along dof (reference
        vector.py:167)."""
        datas = [v.tensor if isinstance(v, ManifoldVariable) else v
                 for v in vectors]
        cat = (np.concatenate if all(isinstance(d, np.ndarray) for d in datas)
               else jnp.concatenate)
        data = cat([d for d in datas], axis=-1)
        return ManifoldVariable(euclidean(int(data.shape[-1])), data, name)

    # point accessors (reference point_types.py:32-59)
    def x(self):
        return self.tensor[..., 0]

    def y(self):
        return self.tensor[..., 1]

    def z(self):
        if self.dof < 3:
            raise AttributeError("z() requires dof >= 3")
        return self.tensor[..., 2]


# -- convenience constructors (parity with th.SE3(...), th.Vector(...)) -----


def SE3(tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    return ManifoldVariable(_groupmod.SE3, tensor, name)


def SO3(tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    return ManifoldVariable(_groupmod.SO3, tensor, name)


def SE2(tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    return ManifoldVariable(_groupmod.SE2, tensor, name)


def SO2(tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    return ManifoldVariable(_groupmod.SO2, tensor, name)


def Vector(dof: Optional[int] = None, tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    if dof is None:
        if tensor is None:
            raise ValueError("Vector needs dof or tensor")
        dof = int(np.asarray(tensor).shape[-1])
    return ManifoldVariable(euclidean(dof), tensor, name)


def Point2(tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    return ManifoldVariable(euclidean(2), tensor, name)


def Point3(tensor=None, name: Optional[str] = None) -> ManifoldVariable:
    return ManifoldVariable(euclidean(3), tensor, name)


_SCALAR_MEMO: dict = {}
_SCALAR_MEMO_MAX = 4096


def _memo_scalar(value, shape=None):
    """Bounded, x64-aware memo for Python-scalar constants: the key carries
    the current x64 flag (an entry created before toggling jax_enable_x64
    must not be reused after), and the cache evicts oldest-first so
    data-dependent weights (10^5 distinct floats) cannot leak unboundedly.
    `shape` memoizes the RESHAPED constant: a post-hoc .reshape on the hit
    dispatches one eager op per call, which on a remote backend costs a
    ~0.1 s round-trip per cost (a 2500-pose objective build took 103 s of
    nothing but default-weight reshapes)."""
    import jax as _jax

    key = (type(value), value, shape, bool(_jax.config.jax_enable_x64))
    hit = _SCALAR_MEMO.get(key)
    if hit is None:
        if len(_SCALAR_MEMO) >= _SCALAR_MEMO_MAX:
            _SCALAR_MEMO.pop(next(iter(_SCALAR_MEMO)))
        hit = jnp.asarray(value)
        if shape is not None:
            hit = hit.reshape(shape)
        _SCALAR_MEMO[key] = hit
    return hit


def as_variable(value, name: Optional[str] = None) -> Variable:
    """Wrap raw data as an aux Variable (reference core/variable.py:107).
    Host arrays stay host-side (see Variable.__init__). Python scalars
    become WEAK-typed jnp scalars (a strongly-typed numpy f64 would promote
    f32 problems under x64), memoized so building a 10^5-cost objective
    dispatches each distinct constant once, not once per cost."""
    if isinstance(value, Variable):
        return value
    if isinstance(value, (bool, int, float)):
        value = _memo_scalar(value)
    elif not isinstance(value, (np.ndarray, jnp.ndarray)):
        value = np.asarray(value)
    return Variable(tensor=value, name=name)
