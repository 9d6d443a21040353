"""Group namespaces: bundles of functional Lie ops per group type.

The JAX analog of torchlie's `LieGroupFns` namespaces
(torchlie/torchlie/functional/lie_group.py:332-366): a frozen dataclass of
pure functions, hashable so it can ride along as static metadata through jit.
Generic derived ops (retract/local/between and their analytic jacobians)
follow the reference's LieGroup base class (theseus/geometry/lie_group.py:
_retract_impl :197 `compose(exp(delta))`, _local_impl :180 `log(between)`,
compose/inverse jacobians :162-178).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp

from . import rn, se2, se3, so2, so3


@dataclasses.dataclass(frozen=True)
class Group:
    """Namespace of functional ops for one manifold/group type."""

    name: str
    dof: int
    shape: Tuple[int, ...]  # trailing element shape, e.g. (3, 4) for SE3
    mod: Any = dataclasses.field(compare=False, repr=False)

    def __post_init__(self):
        pass

    # --- raw ops (delegate to the module) -------------------------------
    def exp(self, x):
        return self.mod.exp(x)

    def jexp(self, x):
        return self.mod.jexp(x)

    def log(self, g):
        return self.mod.log(g)

    def jlog(self, g):
        return self.mod.jlog(g)

    def compose(self, a, b):
        return self.mod.compose(a, b)

    def jcompose(self, a, b):
        return self.mod.jcompose(a, b)

    def inverse(self, g):
        return self.mod.inverse(g)

    def jinverse(self, g):
        return self.mod.jinverse(g)

    def adjoint(self, g):
        return self.mod.adjoint(g)

    def normalize(self, g):
        return self.mod.normalize(g)

    # --- algebra / matrix-rep ops (reference LieGroupFns surface:
    # torchlie/torchlie/functional/lie_group.py:332-366) ------------------
    def hat(self, x):
        return self.mod.hat(x)

    def vee(self, m):
        return self.mod.vee(m)

    def lift(self, x):
        return self.mod.lift(x)

    def project(self, m):
        return self.mod.project(m)

    def left_act(self, g, m):
        return self.mod.left_act(g, m)

    def left_project(self, g, m):
        return self.mod.left_project(g, m)

    def to_matrix(self, g):
        return self.mod.to_matrix(g)

    # --- point action (transform for SE*, rotate for SO*) ----------------
    def transform(self, g, p):
        if hasattr(self.mod, "transform"):
            return self.mod.transform(g, p)
        return self.mod.rotate(g, p)

    def untransform(self, g, p):
        if hasattr(self.mod, "untransform"):
            return self.mod.untransform(g, p)
        return self.mod.unrotate(g, p)

    def jtransform(self, g, p):
        if hasattr(self.mod, "jtransform"):
            return self.mod.jtransform(g, p)
        return self.mod.jrotate(g, p)

    def juntransform(self, g, p):
        if hasattr(self.mod, "juntransform"):
            return self.mod.juntransform(g, p)
        return self.mod.junrotate(g, p)

    def egrad_to_tangent(self, g, grad):
        """Project a Euclidean gradient onto the right-tangent space."""
        if hasattr(self.mod, "egrad_to_tangent"):
            return self.mod.egrad_to_tangent(g, grad)
        return self.mod.left_project(g, grad)

    # --- derived ops ----------------------------------------------------
    def retract(self, g, delta):
        """g * exp(delta) (reference lie_group.py:197)."""
        return self.mod.compose(g, self.mod.exp(delta))

    def local(self, a, b):
        """log(a^{-1} b) (reference lie_group.py:180)."""
        return self.mod.log(self.mod.compose(self.mod.inverse(a), b))

    def between(self, a, b):
        return self.mod.compose(self.mod.inverse(a), b)

    def jbetween(self, a, b):
        """J_a = -Adj(b^{-1} a), J_b = I."""
        diff = self.between(a, b)
        ja = -self.mod.adjoint(self.mod.inverse(diff))
        bshape = jnp.broadcast_shapes(a.shape[: a.ndim - len(self.shape)],
                                      b.shape[: b.ndim - len(self.shape)])
        jb = jnp.broadcast_to(jnp.eye(self.dof, dtype=a.dtype), bshape + (self.dof, self.dof))
        return [jnp.broadcast_to(ja, bshape + (self.dof, self.dof)), jb], diff

    def jlocal(self, a, b):
        """J_a = -Adj(diff^{-1}) @ jlog, J_b = jlog (reference lie_group.py:180-195;
        the two factors commute as power series in ad_xi)."""
        diff = self.between(a, b)
        (dlog,), ret = self.mod.jlog(diff)
        ja = -self.mod.adjoint(self.mod.inverse(diff)) @ dlog
        bshape = jnp.broadcast_shapes(a.shape[: a.ndim - len(self.shape)],
                                      b.shape[: b.ndim - len(self.shape)])
        return [jnp.broadcast_to(ja, bshape + (self.dof, self.dof)),
                jnp.broadcast_to(dlog, bshape + (self.dof, self.dof))], ret

    def identity(self, *batch, dtype=jnp.float32):
        if self.mod is rn:
            return rn.identity(self.dof, *batch, dtype=dtype)
        return self.mod.identity(*batch, dtype=dtype)

    def rand(self, key, *batch, dtype=jnp.float32):
        if self.mod is rn:
            return rn.rand(key, self.dof, *batch, dtype=dtype)
        return self.mod.rand(key, *batch, dtype=dtype)

    def randn(self, key, *batch, dtype=jnp.float32):
        if self.mod is rn:
            return rn.randn(key, self.dof, *batch, dtype=dtype)
        return self.mod.randn(key, *batch, dtype=dtype)


SO2 = Group(name="SO2", dof=so2.DOF, shape=so2.SHAPE, mod=so2)
SE2 = Group(name="SE2", dof=se2.DOF, shape=se2.SHAPE, mod=se2)
SO3 = Group(name="SO3", dof=so3.DOF, shape=so3.SHAPE, mod=so3)
SE3 = Group(name="SE3", dof=se3.DOF, shape=se3.SHAPE, mod=se3)

_EUCLIDEAN_CACHE: dict = {}


def euclidean(dof: int) -> Group:
    """R^dof as a trivial group (reference Vector/Point2/Point3)."""
    if dof not in _EUCLIDEAN_CACHE:
        _EUCLIDEAN_CACHE[dof] = Group(name=f"Rn{dof}", dof=dof, shape=(dof,), mod=rn)
    return _EUCLIDEAN_CACHE[dof]


Point2 = euclidean(2)
Point3 = euclidean(3)


def by_name(name: str) -> Group:
    table = {"SO2": SO2, "SE2": SE2, "SO3": SO3, "SE3": SE3}
    if name in table:
        return table[name]
    if name.startswith("Rn"):
        return euclidean(int(name[2:]))
    raise KeyError(name)
