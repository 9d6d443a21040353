"""Pose-graph datasets: synthetic generators and g2o file readers.

Re-design of the reference PGO example helpers
(theseus/utils/examples/pose_graph/dataset.py:35,110,178,238): the synthetic
generator produces the whole problem (ground truth chain, noisy relative
measurements, noisy initialization) in ONE jitted call over stacked arrays —
per-pose Python loops would cost a device round-trip each on remote TPU
backends. g2o readers cover VERTEX_SE3:QUAT/EDGE_SE3:QUAT (3D) and
VERTEX_SE2/EDGE_SE2 (2D).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import core
from ...embodied import Between, Local
from ...lie import se2, se3, so3


def chain_edges(n_poses: int, extra_loop_closures: bool = True) -> List[Tuple[int, int]]:
    edges = [(i, i + 1) for i in range(n_poses - 1)]
    if extra_loop_closures:
        edges += [(n_poses - 1, 0), (0, n_poses // 2)]
    return edges


@partial(jax.jit, static_argnames=("n_poses", "batch", "edges", "dtype"))
def _generate(key, n_poses: int, batch: int, edges, step_scale, meas_noise,
              init_noise, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    steps = se3.exp(step_scale * jax.random.normal(k1, (n_poses - 1, batch, 6), dtype=dtype))

    def chain(carry, step):
        nxt = se3.compose(carry, step)
        return nxt, nxt

    _, rest = jax.lax.scan(chain, se3.identity(batch, dtype=dtype), steps)
    gt = jnp.concatenate([se3.identity(1, batch, dtype=dtype), rest], axis=0)  # (N,B,3,4)

    e = jnp.asarray(edges)
    rel = se3.compose(se3.inverse(gt[e[:, 0]]), gt[e[:, 1]])
    noise = se3.exp(meas_noise * jax.random.normal(k2, (len(edges), batch, 6), dtype=dtype))
    measurements = se3.compose(rel, noise)

    init = se3.compose(
        gt, se3.exp(init_noise * jax.random.normal(k3, (n_poses, batch, 6), dtype=dtype))
    )
    return gt, measurements, init


def synthetic_pose_graph(
    n_poses: int = 64,
    batch: int = 16,
    seed: int = 0,
    step_scale: float = 0.3,
    meas_noise: float = 0.05,
    init_noise: float = 0.2,
    dtype=jnp.float32,
    extra_loop_closures: bool = True,
):
    """Returns (gt (N,B,3,4), edges, measurements (E,B,3,4), init (N,B,3,4))."""
    edges = tuple(chain_edges(n_poses, extra_loop_closures))
    key = jax.random.PRNGKey(seed)
    gt, meas, init = _generate(
        key, n_poses, batch, edges, step_scale, meas_noise, init_noise, dtype
    )
    return gt, list(edges), meas, init


def build_pgo_objective(
    n_poses: int,
    edges: List[Tuple[int, int]],
    measurements,
    prior_target,
    dtype=jnp.float32,
    edge_weight=None,
    prior_weight: float = 10.0,
    robust_loss_cls=None,
    log_loss_radius: float = 0.0,
):
    """Objective over named SE3 pose variables, Between costs per edge and a
    prior on pose_0 (the reference PGO example structure,
    examples/pose_graph/pose_graph_synthetic.py:87)."""
    obj = core.Objective(dtype=dtype)
    poses = [core.SE3(name=f"pose_{i}") for i in range(n_poses)]
    obj.add(
        Local(
            poses[0],
            prior_target,
            core.ScaleCostWeight(jnp.asarray(prior_weight, dtype)),
            name="prior",
        )
    )
    w = edge_weight
    radius_var = None
    if robust_loss_cls is not None:
        radius_var = core.Variable(
            jnp.full((1, 1), log_loss_radius, dtype), name="log_loss_radius"
        )
    meas_np = np.asarray(measurements)  # host-side slicing: per-edge device
    # slices would pay an eager dispatch round-trip each on remote TPU
    for ei, (i, j) in enumerate(edges):
        cost = Between(poses[i], poses[j], meas_np[ei], cost_weight=w, name=f"edge_{ei}")
        if robust_loss_cls is not None:
            cost = core.RobustCostFunction(
                cost, robust_loss_cls, radius_var, name=f"redge_{ei}"
            )
        obj.add(cost)
    return obj, poses


def pose_values(init) -> Dict[str, jnp.ndarray]:
    """(N, B, 3, 4) stacked initialization -> {pose_i: (B, 3, 4)}."""
    init = np.asarray(init)  # one transfer, host-side slicing
    return {f"pose_{i}": init[i] for i in range(init.shape[0])}


# ---------------------------------------------------------------------------
# g2o readers (reference dataset.py:110 read_3D_g2o_file, :178 read_2D)
# ---------------------------------------------------------------------------
def read_3d_g2o(path: str, dtype=jnp.float64):
    """Returns (num_poses, poses (N,1,3,4), edges [(i,j)], measurements
    (E,1,3,4), weights (E,6,6) sqrt-information)."""
    verts: Dict[int, np.ndarray] = {}
    edges: List[Tuple[int, int]] = []
    meas_q: List[np.ndarray] = []
    infos: List[np.ndarray] = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE3:QUAT":
                i = int(tok[1])
                x, y, z, qx, qy, qz, qw = map(float, tok[2:9])
                verts[i] = np.array([x, y, z, qw, qx, qy, qz])
            elif tok[0] == "EDGE_SE3:QUAT":
                i, j = int(tok[1]), int(tok[2])
                x, y, z, qx, qy, qz, qw = map(float, tok[3:10])
                edges.append((i, j))
                meas_q.append(np.array([x, y, z, qw, qx, qy, qz]))
                upper = np.array(list(map(float, tok[10:31])))
                info = np.zeros((6, 6))
                iu = np.triu_indices(6)
                info[iu] = upper
                info = info + np.triu(info, 1).T
                infos.append(info)
    n = len(verts)

    def to_se3(arr):
        t = jnp.asarray(arr[:, :3], dtype)
        r = so3.quaternion_to_rotation(jnp.asarray(arr[:, 3:7], dtype))
        return jnp.concatenate([r, t[..., None]], axis=-1)

    vs = np.stack([verts[i] for i in range(n)])
    poses = to_se3(vs)[:, None]
    meas = to_se3(np.stack(meas_q))[:, None]
    # sqrt-information via cholesky (weights apply as W e)
    w = jnp.asarray(
        np.stack([np.linalg.cholesky(i).T for i in infos]), dtype
    )
    return n, poses, edges, meas, w


def read_2d_g2o(path: str, dtype=jnp.float64):
    """VERTEX_SE2/EDGE_SE2 reader. Returns (n, poses (N,1,4), edges,
    measurements (E,1,4), weights (E,3,3))."""
    verts: Dict[int, np.ndarray] = {}
    edges: List[Tuple[int, int]] = []
    meas: List[np.ndarray] = []
    infos: List[np.ndarray] = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE2":
                i = int(tok[1])
                x, y, th = map(float, tok[2:5])
                verts[i] = np.array([x, y, np.cos(th), np.sin(th)])
            elif tok[0] == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                x, y, th = map(float, tok[3:6])
                edges.append((i, j))
                meas.append(np.array([x, y, np.cos(th), np.sin(th)]))
                upper = list(map(float, tok[6:12]))
                info = np.zeros((3, 3))
                iu = np.triu_indices(3)
                info[iu] = upper
                info = info + np.triu(info, 1).T
                infos.append(info)
    n = len(verts)
    poses = jnp.asarray(np.stack([verts[i] for i in range(n)]), dtype)[:, None]
    meas_a = jnp.asarray(np.stack(meas), dtype)[:, None]
    w = jnp.asarray(np.stack([np.linalg.cholesky(i).T for i in infos]), dtype)
    return n, poses, edges, meas_a, w
