"""LieArray: a typed array wrapper enforcing closed Lie-group ops.

Re-design of torchlie's LieTensor (torchlie/torchlie/lie_tensor.py:42,58,148):
where the reference subclasses torch.Tensor and allow-lists torch functions
through __torch_function__, the JAX-native analog is a small pytree-registered
wrapper: the data rides through jit/vmap/grad as a leaf while the ltype
(group) is static aux data. Raw-tensor escape hatch: `.as_euclidean()`
(reference lie_tensor.py:148); in-place `add_`-style retract for optimizers
becomes the pure `.retract(delta)`.
"""

from __future__ import annotations

import threading
from typing import List, Optional

import jax
import jax.numpy as jnp

from .group import SE2, SE3, SO2, SO3, Group

_euclidean_ctx = threading.local()


def euclidean_enabled() -> bool:
    """True inside a `with as_euclidean():` block (reference
    lie_tensor.py:54 euclidean_enabled)."""
    return getattr(_euclidean_ctx, "enabled", False)


class as_euclidean:
    """Context manager treating LieArrays as raw euclidean arrays: inside the
    block, arithmetic dunders operate on `.data` and return plain jnp arrays
    (reference _EuclideanContext, lie_tensor.py:32-54)."""

    def __enter__(self):
        self._prev = euclidean_enabled()
        _euclidean_ctx.enabled = True
        return self

    def __exit__(self, *exc):
        _euclidean_ctx.enabled = self._prev
        return False


@jax.tree_util.register_pytree_node_class
class LieArray:
    def __init__(self, data, group: Group):
        self.data = jnp.asarray(data) if not isinstance(data, jnp.ndarray) else data
        self.group = group

    # pytree protocol: data is a leaf, group is static
    def tree_flatten(self):
        return (self.data,), self.group

    @classmethod
    def tree_unflatten(cls, group, children):
        (data,) = children
        obj = cls.__new__(cls)
        obj.data = data
        obj.group = group
        return obj

    # --- constructors ---------------------------------------------------
    @classmethod
    def identity(cls, group: Group, *batch, dtype=jnp.float32):
        return cls(group.identity(*batch, dtype=dtype), group)

    @classmethod
    def rand(cls, group: Group, key, *batch, dtype=jnp.float32):
        return cls(group.rand(key, *batch, dtype=dtype), group)

    @classmethod
    def exp(cls, group: Group, tangent):
        return cls(group.exp(tangent), group)

    @classmethod
    def jexp(cls, group: Group, tangent):
        jacs, val = group.jexp(tangent)
        return jacs, cls(val, group)

    @classmethod
    def from_tensor(cls, data, group: Group) -> "LieArray":
        """Wrap an existing array without copying (reference
        LieTensor.from_tensor, lie_tensor.py:204)."""
        return cls(data, group)

    # --- closed ops -----------------------------------------------------
    def _check(self, other: "LieArray"):
        if not isinstance(other, LieArray) or other.group != self.group:
            raise ValueError(
                f"ltype mismatch: {self.group.name} vs "
                f"{getattr(getattr(other, 'group', None), 'name', type(other).__name__)}"
            )

    def compose(self, other: "LieArray") -> "LieArray":
        self._check(other)
        return LieArray(self.group.compose(self.data, other.data), self.group)

    def inv(self) -> "LieArray":
        return LieArray(self.group.inverse(self.data), self.group)

    inverse = inv

    def log(self):
        return self.group.log(self.data)

    def adj(self):
        return self.group.adjoint(self.data)

    adjoint = adj

    def between(self, other: "LieArray") -> "LieArray":
        self._check(other)
        return LieArray(self.group.between(self.data, other.data), self.group)

    def local(self, other: "LieArray"):
        self._check(other)
        return self.group.local(self.data, other.data)

    def retract(self, delta) -> "LieArray":
        return LieArray(self.group.retract(self.data, delta), self.group)

    def normalize(self) -> "LieArray":
        return LieArray(self.group.normalize(self.data), self.group)

    def transform(self, point):
        if not hasattr(self.group.mod, "transform") and hasattr(self.group.mod, "rotate"):
            return self.group.mod.rotate(self.data, point)
        return self.group.mod.transform(self.data, point)

    def untransform(self, point):
        if not hasattr(self.group.mod, "untransform") and hasattr(self.group.mod, "unrotate"):
            return self.group.mod.unrotate(self.data, point)
        return self.group.mod.untransform(self.data, point)

    def left_act(self, matrix):
        """Left action on a matrix (reference lie_tensor.py:292)."""
        return self.group.left_act(self.data, matrix)

    def left_project(self, matrix):
        """Euclidean matrix-rep grad -> right tangent (reference
        lie_tensor.py:295)."""
        return self.group.left_project(self.data, matrix)

    def hat(self, tangent):
        """Tangent vector -> algebra matrix for this group type."""
        return self.group.hat(tangent)

    def vee(self, matrix):
        return self.group.vee(matrix)

    def to_matrix(self):
        return self.group.to_matrix(self.data)

    # --- jacobian variants (reference lie_tensor.py:271-335) ------------
    def jlog(self):
        return self.group.jlog(self.data)

    def jcompose(self, other: "LieArray"):
        self._check(other)
        jacs, val = self.group.jcompose(self.data, other.data)
        return jacs, LieArray(val, self.group)

    def jinverse(self):
        jacs, val = self.group.jinverse(self.data)
        return jacs, LieArray(val, self.group)

    def jlocal(self, other: "LieArray"):
        self._check(other)
        return self.group.jlocal(self.data, other.data)

    def jinv(self):
        return self.jinverse()

    def jtransform(self, point):
        """Jacobians [d/dg, d/dp] and value of transform (reference
        lie_tensor.py:327)."""
        return self.group.jtransform(self.data, point)

    def juntransform(self, point):
        return self.group.juntransform(self.data, point)

    def jretract(self, delta):
        """Jacobian of retract wrt the tangent delta at the retracted point,
        plus the retracted element: J = jexp evaluated at delta composed via
        the adjoint chain (right-perturbation convention)."""
        (jexp_d,), e = self.group.jexp(delta)
        val = self.group.compose(self.data, e)
        return [jexp_d], LieArray(val, self.group)

    # --- escape hatch / misc --------------------------------------------
    def as_euclidean(self):
        """Raw array view (reference lie_tensor.py:148)."""
        return self.data

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def batch_shape(self):
        return self.data.shape[: self.data.ndim - len(self.group.shape)]

    def __getitem__(self, idx):
        return LieArray(self.data[idx], self.group)

    def __matmul__(self, other):
        """g @ h = compose (closed); raw matmul requires as_euclidean()."""
        if isinstance(other, LieArray):
            return self.compose(other)
        raise TypeError(
            "Raw matmul on a LieArray is not allowed; use .as_euclidean() "
            "to escape to plain arrays (reference lie_tensor allow-list)."
        )

    def __add__(self, other):
        if euclidean_enabled():
            return self.data + (other.data if isinstance(other, LieArray) else other)
        raise TypeError(
            "Addition is not a closed Lie op; use .retract(delta), "
            ".as_euclidean(), or a `with lie.as_euclidean():` block "
            "(reference LieTensor blocks unlisted torch fns)."
        )

    __radd__ = __add__

    def __sub__(self, other):
        if euclidean_enabled():
            return self.data - (other.data if isinstance(other, LieArray) else other)
        raise TypeError(
            "Subtraction is not a closed Lie op; use .local(other) or "
            "a `with lie.as_euclidean():` block."
        )

    def __mul__(self, other):
        if euclidean_enabled():
            return self.data * (other.data if isinstance(other, LieArray) else other)
        raise TypeError(
            "`*` is not a closed Lie op (reference LieTensor.__mul__ raises "
            "the same way, lie_tensor.py:371); use `@` for composition or a "
            "`with lie.as_euclidean():` block for raw elementwise multiply."
        )

    __rmul__ = __mul__

    def __repr__(self):
        return f"LieArray({self.group.name}, shape={tuple(self.data.shape)})"


# --- free-function API (reference lie_tensor.py:558-632) -----------------
def as_lietensor(data, group: Group) -> LieArray:
    """Wrap data as a LieArray of the given group type (reference
    as_lietensor, lie_tensor.py:435). A LieArray of the same type passes
    through unchanged; a mismatched type raises."""
    if isinstance(data, LieArray):
        if data.group != group:
            raise ValueError(f"ltype mismatch: {data.group.name} vs {group.name}")
        return data
    return LieArray(data, group)


cast = as_lietensor
from_tensor = LieArray.from_tensor


def log(g: LieArray):
    return g.log()


def adj(g: LieArray):
    return g.adj()


def inv(g: LieArray) -> LieArray:
    return g.inv()


def compose(g1: LieArray, g2: LieArray) -> LieArray:
    return g1.compose(g2)


def between(g1: LieArray, g2: LieArray) -> LieArray:
    return g1.between(g2)


def transform(g: LieArray, point):
    return g.transform(point)


def untransform(g: LieArray, point):
    return g.untransform(point)


def left_act(g: LieArray, matrix):
    return g.left_act(matrix)


def left_project(g: LieArray, matrix):
    return g.left_project(matrix)


def retract(g: LieArray, delta) -> LieArray:
    return g.retract(delta)


def local(g1: LieArray, g2: LieArray):
    return g1.local(g2)


def normalize(g: LieArray) -> LieArray:
    return g.normalize()


def jlog(g: LieArray):
    return g.jlog()


def jinv(g: LieArray):
    return g.jinverse()


def jcompose(g1: LieArray, g2: LieArray):
    return g1.jcompose(g2)


def jtransform(g: LieArray, point):
    return g.jtransform(point)


def juntransform(g: LieArray, point):
    return g.juntransform(point)
