"""Problem-axis (factor) sharding of GBP: ONE problem's factor messages
split across the 8-virtual-device mesh, XLA inserting the belief-aggregation
all-reduces — parity with the single-device solve. The batch axis stays
whole; this is the 'one big problem across chips' direction the reference
never had (SURVEY §2.9 N/A row)."""

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.lie import se3
from theseus_tpu.optim.gbp import GBPNormal, GBPNormalBuilder
from theseus_tpu.parallel import make_mesh, shard_gbp_factors
from theseus_tpu.utils.examples.pose_graph import (build_pgo_objective,
                                                   pose_values,
                                                   synthetic_pose_graph)


def _normal(n_poses=32, batch=2, dtype=jnp.float64):
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=dtype,
        extra_loop_closures=False)
    edges = edges + [(0, n_poses // 2)]  # n_poses edges: divides the mesh
    closure = se3.compose(se3.inverse(gt[0]), gt[n_poses // 2])
    meas = jnp.concatenate([meas, closure[None]], axis=0)
    obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0], dtype=dtype)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    bld = GBPNormalBuilder(co, msg_iters=15, msg_damping=0.3)
    return bld, bld.build(state, aux)


def test_gbp_factor_sharded_parity():
    bld, normal = _normal()

    def solve(lams, etas):
        ns = GBPNormal(bld, lams, etas, normal.dtype, normal.bsz)
        delta, _ = ns.solve(damping=1e-3)
        return delta

    jsolve = jax.jit(solve)
    d_ref = np.asarray(jsolve(normal.lams, normal.etas))

    mesh = make_mesh(8, axis="factors")
    sharded = shard_gbp_factors(normal, mesh)
    # the Between bucket (K = 32) must actually be split; the prior (K = 1)
    # replicated
    bet_leaf = sharded.etas[
        max(range(len(sharded.etas)), key=lambda i: sharded.etas[i][0].shape[0])
    ][0]
    assert len(bet_leaf.sharding.device_set) == 8
    hlo = jsolve.lower(sharded.lams, sharded.etas).compile().as_text()
    assert hlo.count("all-reduce") > 0, "factor axis silently replicated"
    with mesh:
        d_sh = np.asarray(jsolve(sharded.lams, sharded.etas))
    np.testing.assert_allclose(d_ref, d_sh, rtol=1e-9, atol=1e-12)
