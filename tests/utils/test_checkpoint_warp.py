"""Contract tests for utils/checkpoint.py and utils/warp.py.

VERDICT r4 flagged both modules as smoke-tested only. These pin:
- checkpoint: value/pytree round-trips (dtype, suffix handling, nested
  structures) and the real contract — resuming a solve from a checkpoint
  reproduces the uninterrupted trajectory bit-for-bit.
- warp: bilinear exactness on linear images (the interpolant is linear),
  border clamping, channel consistency, analytic gradients vs finite
  differences, and double-backward through the homography composition
  (the property the reference's third_party/utils.py:5 grid_sample was
  hand-written for).
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.utils.checkpoint import (
    load_pytree,
    load_values,
    save_pytree,
    save_values,
)
from theseus_tpu.utils.warp import (
    bilinear_sample,
    homography_transform,
    image_grid,
)


# ---------------------------------------------------------------- checkpoint


def test_values_roundtrip_dtype_and_suffix(tmp_path):
    vals = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": jnp.array([1.5, -2.5], dtype=jnp.float32),
    }
    # no suffix on save (np.savez appends .npz), no suffix on load
    save_values(str(tmp_path / "ckpt"), vals)
    back = load_values(str(tmp_path / "ckpt"))
    assert set(back) == {"a", "b"}
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(vals["a"]))
    # explicit suffix on load + dtype cast
    back16 = load_values(str(tmp_path / "ckpt.npz"), dtype=jnp.bfloat16)
    assert back16["b"].dtype == jnp.bfloat16


def test_pytree_roundtrip_nested(tmp_path):
    Point = collections.namedtuple("Point", ["x", "y"])
    tree = {
        "state": [jnp.ones((2, 2)), jnp.zeros(3)],
        "info": Point(x=jnp.array([1.0]), y=jnp.array([2.0, 3.0])),
        "step": jnp.array(7),
    }
    save_pytree(str(tmp_path / "tree"), tree)
    back = load_pytree(str(tmp_path / "tree"), like=tree)
    assert isinstance(back["info"], Point)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_structure_mismatch_raises(tmp_path):
    save_pytree(str(tmp_path / "t"), {"a": jnp.ones(2)})
    with pytest.raises(ValueError):
        load_pytree(str(tmp_path / "t"), like={"a": jnp.ones(2),
                                               "b": jnp.ones(2)})


def _small_pgo(n=8, batch=2, seed=0):
    from theseus_tpu import lie

    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 2 * n + 1)
    g = lie.SE3
    gt = [g.identity(batch, dtype=jnp.float64)]
    for i in range(1, n):
        step = g.exp(0.4 * jax.random.normal(keys[i], (batch, 6),
                                             dtype=jnp.float64))
        gt.append(jax.vmap(g.compose)(gt[-1], step))
    obj = tt.Objective(dtype=jnp.float64)
    poses = [tt.SE3(name=f"pose_{i}") for i in range(n)]
    obj.add(tt.Local(poses[0], gt[0],
                     tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64)),
                     name="prior"))
    for i in range(n - 1):
        rel = jax.vmap(g.compose)(jax.vmap(g.inverse)(gt[i]), gt[i + 1])
        nz = g.exp(0.05 * jax.random.normal(keys[n + i], (batch, 6),
                                            dtype=jnp.float64))
        obj.add(tt.Between(poses[i], poses[i + 1],
                           jax.vmap(g.compose)(rel, nz), name=f"e{i}"))
    init = {
        f"pose_{i}": jax.vmap(g.compose)(
            gt[i],
            g.exp(0.3 * jax.random.normal(keys[n + i], (batch, 6),
                                          dtype=jnp.float64)),
        )
        for i in range(n)
    }
    return obj, init


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """4 iters + checkpoint + 4 iters == 8 straight GN iters, bit-for-bit.

    Gauss-Newton's per-iteration step is a pure function of the current
    state (no damping memory), so values saved with save_values and
    resumed must reproduce the uninterrupted trajectory exactly — the
    contract a training job relies on when resuming from utils/checkpoint.
    Convergence tolerances are zeroed so the early-stop mask (which is
    per-run, not checkpointed) never freezes one trajectory but not the
    other below solver precision.
    """
    obj, init = _small_pgo()
    opt = tt.GaussNewton(obj, linearization="sparse")
    layer = tt.TheseusLayer(opt)
    kw = {"abs_err_tolerance": 0.0, "rel_err_tolerance": 0.0}
    out8, _ = layer.forward(
        dict(init), optimizer_kwargs={"max_iterations": 8, **kw}
    )

    out4, _ = layer.forward(
        dict(init), optimizer_kwargs={"max_iterations": 4, **kw}
    )
    save_values(str(tmp_path / "mid"),
                {k: out4[k] for k in init})
    resumed = load_values(str(tmp_path / "mid"))
    out44, _ = layer.forward(
        dict(resumed), optimizer_kwargs={"max_iterations": 4, **kw}
    )

    for k in init:
        np.testing.assert_allclose(
            np.asarray(out8[k]), np.asarray(out44[k]), rtol=0, atol=0,
            err_msg=f"resume mismatch on {k}",
        )


# ---------------------------------------------------------------------- warp


def test_bilinear_exact_on_linear_image():
    # f(x, y) = 2x - 3y + 1 is reproduced exactly by bilinear interpolation
    h, w = 7, 9
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = jnp.asarray(2.0 * xs - 3.0 * ys + 1.0, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    xy = jnp.asarray(
        np.stack(
            [rng.uniform(0, w - 1, 64), rng.uniform(0, h - 1, 64)], axis=-1
        ),
        dtype=jnp.float32,
    )
    got = bilinear_sample(img, xy)
    want = 2.0 * xy[:, 0] - 3.0 * xy[:, 1] + 1.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_bilinear_integer_coords_and_clamping():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    # integer coordinates hit pixels exactly
    xy = jnp.array([[1.0, 2.0], [3.0, 0.0]])
    np.testing.assert_allclose(np.asarray(bilinear_sample(img, xy)),
                               [9.0, 3.0])
    # far outside clamps to the border pixel
    xy_out = jnp.array([[-5.0, -5.0], [100.0, 100.0]])
    np.testing.assert_allclose(np.asarray(bilinear_sample(img, xy_out)),
                               [0.0, 11.0])


def test_bilinear_channels_consistent():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((5, 6, 3)), dtype=jnp.float32)
    xy = jnp.asarray(
        np.stack([rng.uniform(0, 5, 10), rng.uniform(0, 4, 10)], -1),
        dtype=jnp.float32,
    )
    got = bilinear_sample(img, xy)  # (10, 3)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(got[:, c]),
            np.asarray(bilinear_sample(img[:, :, c], xy)),
            atol=1e-6,
        )


def test_bilinear_gradient_matches_fd():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((8, 8)), dtype=jnp.float64)
    xy0 = jnp.array([2.3, 4.6], dtype=jnp.float64)

    def f(xy):
        return bilinear_sample(img, xy[None, :])[0]

    g = jax.grad(f)(xy0)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2, dtype=xy0.dtype).at[i].set(eps)
        fd = (f(xy0 + e) - f(xy0 - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(fd),
                                   rtol=1e-4)


def test_double_backward_through_homography():
    """grad-of-grad through warp+sample is finite (the reference hand-wrote
    its grid_sample for exactly this; in JAX it must just work)."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.standard_normal((8, 8)), dtype=jnp.float32)
    grid = image_grid(4, 4) + 2.0
    h8_0 = jnp.array([1, 0, 0.3, 0, 1, 0.2, 0, 0], dtype=jnp.float32)

    def loss(h8):
        warped = homography_transform(h8, grid)
        return jnp.sum(bilinear_sample(img, warped) ** 2)

    h = jax.hessian(loss)(h8_0)
    assert h.shape == (8, 8)
    assert bool(jnp.all(jnp.isfinite(h)))
    assert float(jnp.abs(h).max()) > 0.0


def test_homography_identity_translation_grid():
    grid = image_grid(3, 5)
    assert grid.shape == (15, 2)
    # row-major: x varies fastest
    np.testing.assert_allclose(np.asarray(grid[1]), [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(grid[5]), [0.0, 1.0])

    ident = jnp.array([1, 0, 0, 0, 1, 0, 0, 0], dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(homography_transform(ident, grid)), np.asarray(grid),
        atol=1e-6,
    )
    shift = jnp.array([1, 0, 2.5, 0, 1, -1.0, 0, 0], dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(homography_transform(shift, grid)),
        np.asarray(grid) + np.array([2.5, -1.0]),
        atol=1e-5,
    )
    # projective row: matches explicit matrix application
    h8 = jnp.array([1.1, 0.1, 3.0, -0.2, 0.9, 1.0, 0.01, -0.02],
                   dtype=jnp.float32)
    hmat = np.append(np.asarray(h8), 1.0).reshape(3, 3)
    p = np.concatenate([np.asarray(grid), np.ones((15, 1))], axis=-1)
    q = p @ hmat.T
    np.testing.assert_allclose(
        np.asarray(homography_transform(h8, grid)),
        q[:, :2] / q[:, 2:3],
        rtol=1e-5,
    )
