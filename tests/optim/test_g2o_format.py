"""Contract tests for the g2o readers (reference
theseus/utils/examples/pose_graph/dataset.py:35 read_3D_g2o_file, :110
read_2D_g2o_file): hand-written mini fixtures with hand-computed expected
poses / edges / information matrices, plus a solvability check through the
same build path examples/pose_graph_benchmark.py --g2o uses.

Fixture geometry (tests/fixtures/mini_3d.g2o): true poses P0 = I,
P1 = (Rz(90deg), [1,2,3]), P2 = (Rx(180deg), [-1,0.5,2]); the EDGE
measurements are the exact relative poses P_i^{-1} P_j, while the VERTEX
initial guesses perturb P1's yaw by 0.05 rad and P2's translation by
[0.1,-0.05,0.08] — so the parsed problem is exactly solvable back to zero
error. One information matrix carries an off-diagonal entry to pin the
upper-triangular parse order and the sqrt-information convention
W^T W = info.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu.utils.examples.pose_graph import read_2d_g2o, read_3d_g2o

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / "fixtures"

SQ2 = np.sqrt(2.0) / 2.0


def _rz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_read_3d_g2o_contract():
    n, poses, edges, meas, w = read_3d_g2o(str(FIXTURES / "mini_3d.g2o"))
    assert n == 3
    assert poses.shape == (3, 1, 3, 4)
    assert edges == [(0, 1), (1, 2)]
    assert meas.shape == (2, 1, 3, 4)
    assert w.shape == (2, 6, 6)

    poses = np.asarray(poses)[:, 0]
    # vertex 0: identity
    np.testing.assert_allclose(poses[0], np.eye(3, 4), atol=1e-12)
    # vertex 1: Rz(pi/2 + 0.05) (the perturbed initial guess), t = (1,2,3)
    np.testing.assert_allclose(poses[1][:, :3], _rz(np.pi / 2 + 0.05),
                               atol=1e-12)
    np.testing.assert_allclose(poses[1][:, 3], [1, 2, 3], atol=1e-12)
    # vertex 2: Rx(pi) = diag(1,-1,-1), perturbed t
    np.testing.assert_allclose(
        poses[2][:, :3], np.diag([1.0, -1.0, -1.0]), atol=1e-12
    )
    np.testing.assert_allclose(poses[2][:, 3], [-0.9, 0.45, 2.08], atol=1e-12)

    meas = np.asarray(meas)[:, 0]
    # edge (0,1): exact relative pose P0^-1 P1 = (Rz(90deg), [1,2,3])
    np.testing.assert_allclose(meas[0][:, :3], _rz(np.pi / 2), atol=1e-12)
    np.testing.assert_allclose(meas[0][:, 3], [1, 2, 3], atol=1e-12)
    # edge (1,2): P1^-1 P2 — 180deg about (1,-1,0)/sqrt(2), t = Rz(-90)(t2-t1)
    np.testing.assert_allclose(
        meas[1][:, :3], np.array([[0, -1, 0], [-1, 0, 0], [0, 0, -1.0]]),
        atol=1e-12,
    )
    np.testing.assert_allclose(meas[1][:, 3], [-1.5, 2, -1], atol=1e-12)

    # sqrt-information: W^T W = info (g2o stores the row-major upper
    # triangle including the diagonal)
    info0 = np.diag([1.0, 2, 3, 4, 5, 6])
    info0[0, 1] = info0[1, 0] = 0.5
    w = np.asarray(w)
    np.testing.assert_allclose(w[0].T @ w[0], info0, atol=1e-12)
    np.testing.assert_allclose(w[1].T @ w[1], np.eye(6), atol=1e-12)
    # upper-triangular (the reader Cholesky-factors info = L L^T, W = L^T)
    np.testing.assert_allclose(w[0], np.triu(w[0]), atol=1e-15)


def test_read_2d_g2o_contract():
    n, poses, edges, meas, w = read_2d_g2o(str(FIXTURES / "mini_2d.g2o"))
    assert n == 3
    assert poses.shape == (3, 1, 4)
    assert edges == [(0, 1), (1, 2)]

    poses = np.asarray(poses)[:, 0]
    np.testing.assert_allclose(poses[0], [0, 0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(poses[1], [1, 0, 0, 1], atol=1e-12)  # theta=pi/2
    np.testing.assert_allclose(poses[2], [1, 2, -1, 0], atol=1e-12)  # theta=pi

    meas = np.asarray(meas)[:, 0]
    np.testing.assert_allclose(meas[0], [1, 0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(meas[1], [2, 0, 0, 1], atol=1e-12)

    info0 = np.array([[4.0, 1, 0], [1, 4, 0], [0, 0, 1]])
    w = np.asarray(w)
    np.testing.assert_allclose(w[0].T @ w[0], info0, atol=1e-12)
    np.testing.assert_allclose(w[1].T @ w[1], np.eye(3), atol=1e-12)


def test_3d_g2o_solvable():
    """The fixture's measurements are exactly consistent with the unperturbed
    ground truth, so LM from the perturbed vertex guesses must drive the
    error to ~0 (same build path as examples/pose_graph_benchmark.py --g2o)."""
    import theseus_tpu as tt
    from theseus_tpu.utils.examples.pose_graph import build_pgo_objective

    n, poses, edges, meas, _ = read_3d_g2o(str(FIXTURES / "mini_3d.g2o"))
    obj, _ = build_pgo_objective(n, edges, meas, poses[0], dtype=jnp.float64)
    init = {f"pose_{i}": poses[i] for i in range(n)}
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=15, adaptive_damping=True, linearization="sparse"
    )
    values, info = opt.optimize(init)
    final = float(np.asarray(info.last_err).mean())
    first = float(np.asarray(info.err_history)[0].mean())
    assert first > 1e-3  # the perturbation is visible
    assert final < 1e-10


def test_3d_g2o_rejects_missing_tokens(tmp_path):
    """Lines with the wrong arity must raise, not silently mis-parse."""
    bad = tmp_path / "bad.g2o"
    bad.write_text("VERTEX_SE3:QUAT 0 0 0 0 0 0 0\n")  # 7 fields, needs 8
    with pytest.raises((ValueError, IndexError)):
        read_3d_g2o(str(bad))
