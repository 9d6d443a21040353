"""Systematic per-op Lie tests: analytic jacobians vs central finite
differences, exp/log roundtrips, special-point numerics, batch broadcasting.

Modeled on the reference harness (tests/torchlie_tests/functional/common.py:
16,69): every jop must match numeric differentiation through the retract
parametrization, and autodiff (via custom_jvp) must match finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu import lie

GROUPS = [lie.SO2, lie.SE2, lie.SO3, lie.SE3, lie.euclidean(3)]
GROUP_IDS = [g.name for g in GROUPS]
BATCHES = [(), (5,), (2, 3)]


def fd_jac(f, x, h=1e-6):
    """Central-difference jacobian of f: (n,) -> (m,). Returns (m, n)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    cols = []
    for i in range(n):
        e = np.zeros_like(x)
        e.flat[i] = h
        cols.append((np.asarray(f(x + e)) - np.asarray(f(x - e))) / (2 * h))
    return np.stack(cols, axis=-1)


def sample(group, key, batch):
    return group.rand(key, *batch, dtype=jnp.float64)


def sample_tangent(key, group, batch, scale=1.0):
    return scale * jax.random.normal(key, batch + (group.dof,), dtype=jnp.float64)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
@pytest.mark.parametrize("batch", BATCHES)
def test_exp_log_roundtrip(group, batch):
    key = jax.random.PRNGKey(0)
    w = sample_tangent(key, group, batch, scale=0.8)
    g = group.exp(w)
    w2 = group.log(g)
    np.testing.assert_allclose(w, w2, atol=1e-9)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
def test_log_exp_roundtrip(group):
    key = jax.random.PRNGKey(1)
    g = sample(group, key, (7,))
    g2 = group.exp(group.log(g))
    np.testing.assert_allclose(g, g2, atol=1e-9)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
@pytest.mark.parametrize("scale", [1.0, 1e-4, 3.0])
def test_jexp_vs_fd(group, scale):
    """exp(w + dw) ~ exp(w) * exp(J dw)."""
    key = jax.random.PRNGKey(2)
    w = sample_tangent(key, group, (4,), scale=scale)
    (jac,), g = group.jexp(w)
    for b in range(4):
        f = lambda x: np.asarray(group.local(g[b], group.exp(jnp.asarray(x))))
        num = fd_jac(f, np.asarray(w[b]))
        np.testing.assert_allclose(jac[b], num, atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
def test_jlog_vs_fd(group):
    """log(g exp(d)) ~ log(g) + jlog d."""
    key = jax.random.PRNGKey(3)
    g = sample(group, key, (4,))
    (jac,), w = group.jlog(g)
    zero = np.zeros(group.dof)
    for b in range(4):
        f = lambda d: np.asarray(group.log(group.retract(g[b], jnp.asarray(d))))
        num = fd_jac(f, zero)
        np.testing.assert_allclose(jac[b], num, atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
def test_jcompose_jinverse_jlocal_vs_fd(group):
    key1, key2 = jax.random.split(jax.random.PRNGKey(4))
    a = sample(group, key1, (3,))
    b = sample(group, key2, (3,))
    zero = np.zeros(group.dof)

    (ja, jb), ret = group.jcompose(a, b)
    for i in range(3):
        fa = lambda d: np.asarray(
            group.local(ret[i], group.compose(group.retract(a[i], jnp.asarray(d)), b[i]))
        )
        fb = lambda d: np.asarray(
            group.local(ret[i], group.compose(a[i], group.retract(b[i], jnp.asarray(d))))
        )
        np.testing.assert_allclose(ja[i], fd_jac(fa, zero), atol=5e-6, rtol=1e-5)
        np.testing.assert_allclose(jb[i], fd_jac(fb, zero), atol=5e-6, rtol=1e-5)

    (ji,), inv = group.jinverse(a)
    for i in range(3):
        fi = lambda d: np.asarray(
            group.local(inv[i], group.inverse(group.retract(a[i], jnp.asarray(d))))
        )
        np.testing.assert_allclose(ji[i], fd_jac(fi, zero), atol=5e-6, rtol=1e-5)

    (jla, jlb), loc = group.jlocal(a, b)
    for i in range(3):
        fa = lambda d: np.asarray(group.local(group.retract(a[i], jnp.asarray(d)), b[i]))
        fb = lambda d: np.asarray(group.local(a[i], group.retract(b[i], jnp.asarray(d))))
        np.testing.assert_allclose(jla[i], fd_jac(fa, zero), atol=5e-6, rtol=1e-5)
        np.testing.assert_allclose(jlb[i], fd_jac(fb, zero), atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize(
    "group,scale",
    [(lie.SO3, 1e-5), (lie.SO3, 1e-8), (lie.SE3, 1e-5), (lie.SE2, 1e-6)],
    ids=["SO3-tiny", "SO3-zero", "SE3-tiny", "SE2-tiny"],
)
def test_near_zero_stability(group, scale):
    key = jax.random.PRNGKey(5)
    w = sample_tangent(key, group, (4,), scale=scale)
    g = group.exp(w)
    np.testing.assert_allclose(group.log(g), w, atol=1e-10)
    # gradients must be finite at/near zero
    grad = jax.grad(lambda x: jnp.sum(group.exp(x) ** 2))(w)
    assert np.all(np.isfinite(grad))
    grad0 = jax.grad(lambda x: jnp.sum(group.exp(x) ** 2))(jnp.zeros_like(w))
    assert np.all(np.isfinite(grad0))


def test_so3_near_pi():
    key = jax.random.PRNGKey(6)
    axis = jax.random.normal(key, (6, 3), dtype=jnp.float64)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    for ang in [np.pi - 1e-7, np.pi - 1e-3, np.pi - 1e-11]:
        w = axis * ang
        g = lie.SO3.exp(w)
        w2 = lie.SO3.log(g)
        # log may return the equivalent rotation; check exp matches
        np.testing.assert_allclose(lie.SO3.exp(w2), g, atol=1e-7)
        np.testing.assert_allclose(jnp.abs(jnp.linalg.norm(w2, axis=-1)), ang, atol=1e-6)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
def test_autodiff_matches_fd(group):
    """jacfwd and jacrev through composite op chains vs finite differences.

    This exercises the custom_jvp rules on exp/log end to end."""
    key1, key2 = jax.random.split(jax.random.PRNGKey(7))
    a = sample(group, key1, ())
    w0 = sample_tangent(key2, group, (), scale=0.5)

    def f(w):
        return group.local(a, group.retract(group.exp(w), 0.1 * w))

    jf = jax.jacfwd(f)(w0)
    jr = jax.jacrev(f)(w0)
    num = fd_jac(lambda x: np.asarray(f(jnp.asarray(x))), np.asarray(w0))
    np.testing.assert_allclose(jf, num, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(jr, num, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("group", GROUPS, ids=GROUP_IDS)
@pytest.mark.parametrize("batch", BATCHES)
def test_batch_broadcast(group, batch):
    """Multi-batch results must equal per-element results."""
    key = jax.random.PRNGKey(8)
    g = sample(group, key, batch)
    w = sample_tangent(jax.random.PRNGKey(9), group, batch, scale=0.7)
    r = group.retract(g, w)
    flat_g = g.reshape((-1,) + group.shape)
    flat_w = w.reshape((-1, group.dof))
    for i in range(flat_g.shape[0]):
        np.testing.assert_allclose(
            r.reshape((-1,) + group.shape)[i],
            group.retract(flat_g[i], flat_w[i]),
            atol=1e-12,
        )


def test_so3_quaternions():
    key = jax.random.PRNGKey(10)
    g = lie.SO3.rand(key, 32, dtype=jnp.float64)
    q = lie.so3.rotation_to_quaternion(g)
    g2 = lie.so3.quaternion_to_rotation(q)
    np.testing.assert_allclose(g, g2, atol=1e-9)


def test_so3_rotate_jacobians():
    key1, key2 = jax.random.split(jax.random.PRNGKey(11))
    g = lie.SO3.rand(key1, 3, dtype=jnp.float64)
    p = jax.random.normal(key2, (3, 3), dtype=jnp.float64)
    (jg, jp), ret = lie.so3.jrotate(g, p)
    zero = np.zeros(3)
    for i in range(3):
        fg = lambda d: np.asarray(
            lie.so3.rotate(lie.SO3.retract(g[i], jnp.asarray(d)), p[i])
        )
        fp = lambda d: np.asarray(lie.so3.rotate(g[i], p[i] + jnp.asarray(d)))
        np.testing.assert_allclose(jg[i], fd_jac(fg, zero), atol=1e-6)
        np.testing.assert_allclose(jp[i], fd_jac(fp, zero), atol=1e-6)


def test_se3_transform_jacobians():
    key1, key2 = jax.random.split(jax.random.PRNGKey(12))
    g = lie.SE3.rand(key1, 3, dtype=jnp.float64)
    p = jax.random.normal(key2, (3, 3), dtype=jnp.float64)
    for jfn, fn in [
        (lie.se3.jtransform, lie.se3.transform),
        (lie.se3.juntransform, lie.se3.untransform),
    ]:
        (jg, jp), ret = jfn(g, p)
        zero = np.zeros(6)
        zero3 = np.zeros(3)
        for i in range(3):
            fg = lambda d: np.asarray(fn(lie.SE3.retract(g[i], jnp.asarray(d)), p[i]))
            fp = lambda d: np.asarray(fn(g[i], p[i] + jnp.asarray(d)))
            np.testing.assert_allclose(jg[i], fd_jac(fg, zero), atol=1e-6)
            np.testing.assert_allclose(jp[i], fd_jac(fp, zero3), atol=1e-6)


def test_se2_transform_jacobians():
    key1, key2 = jax.random.split(jax.random.PRNGKey(13))
    g = lie.SE2.rand(key1, 3, dtype=jnp.float64)
    p = jax.random.normal(key2, (3, 2), dtype=jnp.float64)
    for jfn, fn in [
        (lie.se2.jtransform, lie.se2.transform),
        (lie.se2.juntransform, lie.se2.untransform),
    ]:
        (jg, jp), ret = jfn(g, p)
        zero = np.zeros(3)
        zero2 = np.zeros(2)
        for i in range(3):
            fg = lambda d: np.asarray(fn(lie.SE2.retract(g[i], jnp.asarray(d)), p[i]))
            fp = lambda d: np.asarray(fn(g[i], p[i] + jnp.asarray(d)))
            np.testing.assert_allclose(jg[i], fd_jac(fg, zero), atol=1e-6)
            np.testing.assert_allclose(jp[i], fd_jac(fp, zero2), atol=1e-6)


def test_vmap_composes():
    """custom_jvp ops must compose with vmap + jacrev (the reference needs
    special machinery for this, torchlie lie_group.py:61; free in JAX)."""
    key = jax.random.PRNGKey(14)
    w = jax.random.normal(key, (8, 6), dtype=jnp.float64)
    jacs = jax.vmap(jax.jacrev(lambda x: lie.SE3.log(lie.SE3.exp(x))))(w)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float64), (8, 6, 6))
    np.testing.assert_allclose(jacs, eye, atol=1e-8)


def test_normalize():
    key = jax.random.PRNGKey(15)
    g = lie.SO3.rand(key, 5, dtype=jnp.float64)
    noisy = g + 0.01 * jax.random.normal(jax.random.PRNGKey(16), g.shape, dtype=jnp.float64)
    fixed = lie.so3.normalize(noisy)
    assert np.all(np.asarray(lie.so3.check_group_tensor(fixed)))
