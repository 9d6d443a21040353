"""Tests for the fattened lie API surface: hat/vee/lift/project duality,
left_act/left_project, jtransform, the LieArray j*-method family, the
euclidean-context escape, and the free-function API.

Mirrors the reference LieTensor surface (torchlie/torchlie/lie_tensor.py:
271-335,371,558-632) and lift/project adjoint conventions
(torchlie functional/lie_group.py:332-366).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu import lie

MATRIX_GROUPS = [lie.SO2, lie.SE2, lie.SO3, lie.SE3]
IDS = [g.name for g in MATRIX_GROUPS]

# matrix-rep shape each group's left_project grad lives in
LP_SHAPE = {"SO2": (2, 2), "SE2": (2, 3), "SO3": (3, 3), "SE3": (3, 4)}


def sample(group, key, batch=()):
    return group.rand(key, *batch, dtype=jnp.float64)


@pytest.mark.parametrize("group", MATRIX_GROUPS, ids=IDS)
def test_hat_vee_roundtrip(group):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, group.dof), dtype=jnp.float64)
    np.testing.assert_allclose(group.vee(group.hat(x)), x, atol=1e-12)


@pytest.mark.parametrize("group", MATRIX_GROUPS, ids=IDS)
def test_lift_project_adjoint(group):
    """<lift(x), m> == <x, project(m)> (project is the adjoint of lift)."""
    key1, key2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(key1, (group.dof,), dtype=jnp.float64)
    m = jax.random.normal(key2, group.lift(x).shape, dtype=jnp.float64)
    lhs = jnp.sum(group.lift(x) * m)
    rhs = jnp.sum(x * group.project(m))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def _matrix_rep(group, g):
    """The matrix rep whose euclidean grads left_project consumes."""
    if group.name == "SO2":
        return group.mod.to_matrix(g)
    if group.name == "SE2":
        r = lie.so2.to_matrix(g[..., 2:4])
        return jnp.concatenate([r, g[..., 0:2, None]], axis=-1)
    return g  # SO3 / SE3 storage is the matrix rep


@pytest.mark.parametrize("group", MATRIX_GROUPS, ids=IDS)
def test_left_project_matches_tangent_grad(group):
    """For f(g) = <M(g), W>, grad in tangent coords == left_project(g, W)."""
    key1, key2 = jax.random.split(jax.random.PRNGKey(2))
    g = sample(group, key1)
    w = jax.random.normal(key2, LP_SHAPE[group.name], dtype=jnp.float64)

    def f(delta):
        return jnp.sum(_matrix_rep(group, group.retract(g, delta)) * w)

    tangent_grad = jax.grad(f)(jnp.zeros((group.dof,), dtype=jnp.float64))
    lp = group.left_project(g, w)
    np.testing.assert_allclose(lp, tangent_grad, atol=1e-9)


@pytest.mark.parametrize("group", MATRIX_GROUPS, ids=IDS)
def test_left_act_is_matrix_product(group):
    key1, key2 = jax.random.split(jax.random.PRNGKey(3))
    g = sample(group, key1, (2,))
    k = {"SO2": 2, "SE2": 2, "SO3": 3, "SE3": 3}[group.name]
    m = jax.random.normal(key2, (2, k, 5), dtype=jnp.float64)
    out = group.left_act(g, m)
    rot = _matrix_rep(group, g)[..., :k, :k]
    np.testing.assert_allclose(out, rot @ m, atol=1e-12)


@pytest.mark.parametrize("group", MATRIX_GROUPS, ids=IDS)
def test_jtransform_fd(group):
    key1, key2 = jax.random.split(jax.random.PRNGKey(4))
    g = sample(group, key1)
    pdim = 2 if group.name in ("SO2", "SE2") else 3
    p = jax.random.normal(key2, (pdim,), dtype=jnp.float64)
    (jg, jp), val = group.jtransform(g, p)
    np.testing.assert_allclose(val, group.transform(g, p), atol=1e-12)
    h = 1e-6
    for i in range(group.dof):
        e = jnp.zeros((group.dof,), dtype=jnp.float64).at[i].set(h)
        fp = group.transform(group.retract(g, e), p)
        fm = group.transform(group.retract(g, -e), p)
        np.testing.assert_allclose(jg[..., i], (fp - fm) / (2 * h), atol=1e-6)
    for i in range(pdim):
        e = jnp.zeros((pdim,), dtype=jnp.float64).at[i].set(h)
        np.testing.assert_allclose(
            jp[..., i],
            (group.transform(g, p + e) - group.transform(g, p - e)) / (2 * h),
            atol=1e-6,
        )


@pytest.mark.parametrize("group", MATRIX_GROUPS, ids=IDS)
def test_juntransform_fd(group):
    key1, key2 = jax.random.split(jax.random.PRNGKey(5))
    g = sample(group, key1)
    pdim = 2 if group.name in ("SO2", "SE2") else 3
    p = jax.random.normal(key2, (pdim,), dtype=jnp.float64)
    (jg, jp), val = group.juntransform(g, p)
    np.testing.assert_allclose(val, group.untransform(g, p), atol=1e-12)
    h = 1e-6
    for i in range(group.dof):
        e = jnp.zeros((group.dof,), dtype=jnp.float64).at[i].set(h)
        fp = group.untransform(group.retract(g, e), p)
        fm = group.untransform(group.retract(g, -e), p)
        np.testing.assert_allclose(jg[..., i], (fp - fm) / (2 * h), atol=1e-6)


def test_jquaternion_to_rotation_fd():
    """J maps raw quaternion perturbations to the rotation's right tangent:
    log(R(q)^T R(q+dq)) ~= J dq (reference so3_impl.py:855-900)."""
    from theseus_tpu.lie import so3

    q = jax.random.normal(jax.random.PRNGKey(20), (4,), dtype=jnp.float64)
    q = q / jnp.linalg.norm(q) * 1.3  # deliberately non-unit: J includes d(normalize)
    (jac,), r = so3.jquaternion_to_rotation(q)
    np.testing.assert_allclose(r, so3.quaternion_to_rotation(q), atol=1e-12)
    h = 1e-6
    for i in range(4):
        e = jnp.zeros(4, dtype=jnp.float64).at[i].set(h)
        rp = so3.quaternion_to_rotation(q + e)
        rm = so3.quaternion_to_rotation(q - e)
        tw = (so3.log(so3.compose(so3.inverse(r), rp))
              - so3.log(so3.compose(so3.inverse(r), rm))) / (2 * h)
        np.testing.assert_allclose(jac[:, i], tw, atol=1e-6)


class TestLieArraySurface:
    def test_jexp_and_jretract(self):
        key = jax.random.PRNGKey(6)
        w = 0.3 * jax.random.normal(key, (4, 3), dtype=jnp.float64)
        (j,), arr = lie.LieArray.jexp(lie.SO3, w)
        assert isinstance(arr, lie.LieArray)
        np.testing.assert_allclose(arr.data, lie.SO3.exp(w), atol=1e-12)
        g = lie.LieArray.rand(lie.SO3, jax.random.PRNGKey(7), 4, dtype=jnp.float64)
        (jr,), r = g.jretract(w)
        np.testing.assert_allclose(jr, j, atol=1e-12)
        np.testing.assert_allclose(r.data, lie.SO3.retract(g.data, w), atol=1e-12)

    def test_jtransform_method(self):
        g = lie.LieArray.rand(lie.SE3, jax.random.PRNGKey(8), 2, dtype=jnp.float64)
        p = jax.random.normal(jax.random.PRNGKey(9), (2, 3), dtype=jnp.float64)
        (jg, jp), val = g.jtransform(p)
        np.testing.assert_allclose(val, g.transform(p), atol=1e-12)
        (jg2, jp2), val2 = g.juntransform(p)
        np.testing.assert_allclose(val2, g.untransform(p), atol=1e-12)

    def test_left_act_project_methods(self):
        g = lie.LieArray.rand(lie.SO3, jax.random.PRNGKey(10), dtype=jnp.float64)
        m = jax.random.normal(jax.random.PRNGKey(11), (3, 3), dtype=jnp.float64)
        np.testing.assert_allclose(g.left_act(m), g.data @ m, atol=1e-12)
        np.testing.assert_allclose(
            g.left_project(m), lie.SO3.left_project(g.data, m), atol=1e-12
        )

    def test_mul_raises_outside_context(self):
        g = lie.LieArray.identity(lie.SO3)
        with pytest.raises(TypeError, match="closed Lie op"):
            g * 2.0
        with pytest.raises(TypeError, match="closed Lie op"):
            g + g
        with pytest.raises(TypeError, match="closed Lie op"):
            g - g

    def test_euclidean_context_allows_raw_arithmetic(self):
        g = lie.LieArray.identity(lie.SO3, dtype=jnp.float64)
        assert not lie.euclidean_enabled()
        with lie.as_euclidean():
            assert lie.euclidean_enabled()
            s = g + g
            p = g * 2.0
            d = g - g
        assert not lie.euclidean_enabled()
        np.testing.assert_allclose(s, 2 * np.eye(3))
        np.testing.assert_allclose(p, 2 * np.eye(3))
        np.testing.assert_allclose(d, np.zeros((3, 3)))

    def test_as_lietensor_and_cast(self):
        data = lie.SE3.rand(jax.random.PRNGKey(12), 3, dtype=jnp.float64)
        arr = lie.as_lietensor(data, lie.SE3)
        assert isinstance(arr, lie.LieArray)
        assert lie.cast(arr, lie.SE3) is arr
        with pytest.raises(ValueError, match="ltype mismatch"):
            lie.as_lietensor(arr, lie.SO3)

    def test_free_functions(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(13))
        a = lie.LieArray.rand(lie.SE3, k1, 2, dtype=jnp.float64)
        b = lie.LieArray.rand(lie.SE3, k2, 2, dtype=jnp.float64)
        np.testing.assert_allclose(
            lie.compose(a, b).data, a.compose(b).data, atol=1e-12
        )
        np.testing.assert_allclose(lie.inv(a).data, a.inv().data, atol=1e-12)
        np.testing.assert_allclose(lie.log(a), a.log(), atol=1e-12)
        np.testing.assert_allclose(lie.local(a, b), a.local(b), atol=1e-12)
        np.testing.assert_allclose(
            lie.between(a, b).data, a.between(b).data, atol=1e-12
        )
        (j1, j2), v = lie.jcompose(a, b)
        np.testing.assert_allclose(v.data, a.compose(b).data, atol=1e-12)
        p = jax.random.normal(jax.random.PRNGKey(14), (2, 3), dtype=jnp.float64)
        np.testing.assert_allclose(lie.transform(a, p), a.transform(p), atol=1e-12)
        np.testing.assert_allclose(
            lie.untransform(a, p), a.untransform(p), atol=1e-12
        )

    def test_to_matrix(self):
        g2 = lie.LieArray.rand(lie.SE2, jax.random.PRNGKey(15), dtype=jnp.float64)
        m = g2.to_matrix()
        assert m.shape == (3, 3)
        np.testing.assert_allclose(m[2], np.array([0.0, 0.0, 1.0]), atol=1e-12)
        g3 = lie.LieArray.rand(lie.SE3, jax.random.PRNGKey(16), dtype=jnp.float64)
        m3 = g3.to_matrix()
        assert m3.shape == (4, 4)
        np.testing.assert_allclose(m3[:3], g3.data, atol=1e-12)
