"""Tests for sparse matvec utilities, manifold-optax updates, checkpointing,
and augmentation helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from theseus_tpu import lie
from theseus_tpu.optim.manifold_optax import lie_optimizer, manifold_update
from theseus_tpu.utils.checkpoint import load_values, save_values
from theseus_tpu.utils.examples.easyaug import geo_aug, photo_aug, random_homography
from theseus_tpu.utils.sparse_utils import (
    mat_vec,
    random_sparse_binary_matrix,
    split_into_param_sizes,
    tmat_vec,
)
from theseus_tpu.utils.warp import bilinear_sample, homography_transform, image_grid


def test_csr_matvecs_match_scipy():
    rng = np.random.RandomState(0)
    a = random_sparse_binary_matrix(12, 9, 0.3, 2, rng)
    bsz = 3
    val = jnp.asarray(rng.randn(bsz, a.nnz))
    v = jnp.asarray(rng.randn(bsz, 9))
    u = jnp.asarray(rng.randn(bsz, 12))
    av = mat_vec(9, a.indptr, a.indices, val, v)
    atu = tmat_vec(9, a.indptr, a.indices, val, u)
    import scipy.sparse as sp

    for b in range(bsz):
        ab = sp.csr_matrix((np.asarray(val[b]), a.indices, a.indptr), shape=(12, 9))
        np.testing.assert_allclose(av[b], ab @ np.asarray(v[b]), atol=1e-12)
        np.testing.assert_allclose(atu[b], ab.T @ np.asarray(u[b]), atol=1e-12)
    # differentiable
    g = jax.grad(lambda x: jnp.sum(mat_vec(9, a.indptr, a.indices, x, v) ** 2))(val)
    assert np.all(np.isfinite(np.asarray(g)))


def test_split_param_sizes():
    sizes = split_into_param_sizes(57, 2, 5)
    assert sizes.sum() == 57 and sizes.min() >= 1 and sizes.max() <= 5


def test_manifold_update_descends():
    key = jax.random.PRNGKey(0)
    target = lie.SO3.rand(key, 4, dtype=jnp.float64)
    x = lie.SO3.identity(4, dtype=jnp.float64)

    def loss(x):
        return jnp.sum(lie.SO3.local(x, target) ** 2)

    for _ in range(60):
        g = jax.grad(loss)(x)
        x = manifold_update(lie.SO3, x, g, 0.2)
        x = lie.SO3.normalize(x)
    assert float(loss(x)) < 1e-8


def test_lie_optimizer_adam():
    key = jax.random.PRNGKey(1)
    target = lie.SE3.rand(key, 2, dtype=jnp.float64)
    params = {"pose": lie.SE3.identity(2, dtype=jnp.float64),
              "scale": jnp.asarray(0.0, jnp.float64)}
    tx = lie_optimizer({"pose": lie.SE3}, optax.adam(5e-2))
    state = tx.init(params)

    def loss(p):
        return jnp.sum(lie.SE3.local(p["pose"], target) ** 2) + p["scale"] ** 2

    l0 = float(loss(params))
    for _ in range(100):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = tx.apply(params, updates)
    assert float(loss(params)) < 0.05 * l0


def test_checkpoint_roundtrip(tmp_path):
    vals = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((1, 4))}
    p = str(tmp_path / "ckpt")
    save_values(p, vals)
    loaded = load_values(p)
    for k in vals:
        np.testing.assert_allclose(loaded[k], vals[k])


def test_easyaug():
    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (24, 32))
    warped, h8 = geo_aug(key, img, perturb=0.05)
    assert warped.shape == img.shape
    # identity-perturbation homography ~ identity mapping
    h8_id = random_homography(key, 24, 32, perturb=0.0)
    np.testing.assert_allclose(
        h8_id, jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], h8_id.dtype), atol=1e-6
    )
    out = photo_aug(key, img)
    assert out.shape == img.shape and float(out.min()) >= 0 and float(out.max()) <= 1


def test_easyaug_classes():
    """RandomGeoAug / RandomPhotoAug parity surface (reference
    third_party/easyaug.py:90,339)."""
    from theseus_tpu.utils.examples.easyaug import (
        GeoAugParam, RandomGeoAug, RandomPhotoAug)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 16, 20))
    ga = RandomGeoAug()
    out, T = ga.forward(key, imgs, return_transform=True)
    assert out.shape == imgs.shape and T.shape == (2, 3, 3)
    ga.set_all_identity()
    np.testing.assert_allclose(
        np.asarray(ga.forward(key, imgs)), np.asarray(imgs), atol=1e-4)
    # channel form
    imgs4 = jax.random.uniform(key, (2, 3, 16, 20))
    assert RandomGeoAug(
        scale_param=GeoAugParam(0.95, 1.05)
    ).forward(key, imgs4).shape == imgs4.shape

    pa = RandomPhotoAug()
    pa.set_all_probs(1.0)
    o = pa.forward(key, imgs)
    assert o.shape == imgs.shape and np.isfinite(np.asarray(o)).all()
    assert float(jnp.abs(o - imgs).max()) > 1e-3
    pa.set_all_probs(0.0)
    np.testing.assert_allclose(np.asarray(pa.forward(key, imgs)),
                               np.asarray(imgs))
