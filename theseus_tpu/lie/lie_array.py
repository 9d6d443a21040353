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

from typing import List, Optional

import jax
import jax.numpy as jnp

from .group import SE2, SE3, SO2, SO3, Group


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
        raise TypeError(
            "Addition is not a closed Lie op; use .retract(delta) or "
            ".as_euclidean() (reference LieTensor blocks unlisted torch fns)."
        )

    def __repr__(self):
        return f"LieArray({self.group.name}, shape={tuple(self.data.shape)})"
