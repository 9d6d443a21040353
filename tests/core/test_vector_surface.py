"""Euclidean Vector/Point2/Point3 arithmetic surface (reference
geometry/test_vector.py + test_point_types.py): elementwise ops, inner/outer
products, norm, cat, point accessors; Lie variables reject arithmetic."""

import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def _v(vals, name=None):
    return tt.Vector(tensor=jnp.asarray(vals, jnp.float64), name=name)


def test_add_sub_mul_div_neg_abs():
    a = _v([[1.0, 2.0], [3.0, 4.0]])
    b = _v([[0.5, -1.0], [2.0, 2.0]])
    np.testing.assert_allclose((a + b).tensor, [[1.5, 1.0], [5.0, 6.0]])
    np.testing.assert_allclose((a - b).tensor, [[0.5, 3.0], [1.0, 2.0]])
    np.testing.assert_allclose((a * 2.0).tensor, [[2, 4], [6, 8]])
    np.testing.assert_allclose((2.0 * a).tensor, [[2, 4], [6, 8]])
    np.testing.assert_allclose((a / 2.0).tensor, [[0.5, 1], [1.5, 2]])
    np.testing.assert_allclose((-a).tensor, [[-1, -2], [-3, -4]])
    np.testing.assert_allclose(abs(-a).tensor, [[1, 2], [3, 4]])


def test_dot_outer_norm():
    a = _v([[1.0, 2.0]])
    b = _v([[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(a.dot(b)), [11.0])
    np.testing.assert_allclose(
        np.asarray(a.outer(b)), [[[3.0, 4.0], [6.0, 8.0]]]
    )
    np.testing.assert_allclose(np.asarray(b.norm()), [5.0])


def test_matmul():
    a = _v([[1.0, 2.0]])
    m = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    np.testing.assert_allclose((a @ m).tensor, [[1.0, 4.0]])
    mb = jnp.stack([m, 2 * m])  # batched (B, dof, dof)
    ab = _v([[1.0, 2.0], [1.0, 2.0]])
    np.testing.assert_allclose((ab @ mb).tensor, [[1.0, 4.0], [2.0, 8.0]])


def test_cat_and_host_preservation():
    a = tt.Vector(tensor=np.ones((2, 2)), name="a")
    b = tt.Vector(tensor=np.zeros((2, 3)), name="b")
    c = tt.ManifoldVariable.cat([a, b], name="c")
    assert c.dof == 5 and c.tensor.shape == (2, 5)
    # host inputs stay host-side (no device dispatch at build time)
    assert isinstance(c.tensor, np.ndarray)
    assert isinstance((a + a).tensor, np.ndarray)


def test_point_accessors():
    p2 = tt.Point2(tensor=jnp.asarray([[1.0, 2.0]]))
    p3 = tt.Point3(tensor=jnp.asarray([[1.0, 2.0, 3.0]]))
    np.testing.assert_allclose(np.asarray(p2.x()), [1.0])
    np.testing.assert_allclose(np.asarray(p2.y()), [2.0])
    np.testing.assert_allclose(np.asarray(p3.z()), [3.0])
    with pytest.raises(AttributeError):
        p2.z()


def test_lie_variables_reject_arithmetic():
    g = tt.SE2(name="g")
    with pytest.raises(TypeError, match="euclidean"):
        g + g
    with pytest.raises(TypeError, match="euclidean and Lie"):
        _v([[1.0, 2.0, 3.0, 4.0]]) + g


def test_arithmetic_result_usable_as_variable():
    """Derived vectors can enter an objective like any variable."""
    a = _v([[0.0, 0.0]], name="x")
    target = _v([[1.0, 1.0]]) * 2.0
    target.name = "t"
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(tt.Local(a, target, tt.ScaleCostWeight(1.0), name="c"))
    out, _ = tt.GaussNewton(obj, max_iterations=3).optimize()
    np.testing.assert_allclose(np.asarray(out["x"]), [[2.0, 2.0]], atol=1e-8)
