"""Block-Jacobi PCG: matches the direct block Cholesky on PGO problems,
including gradients through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.utils.examples.pose_graph import (
    build_pgo_objective,
    pose_values,
    synthetic_pose_graph,
)


def build(n=12, batch=2):
    gt, edges, meas, init = synthetic_pose_graph(n_poses=n, batch=batch, dtype=jnp.float64)
    obj, _ = build_pgo_objective(n, edges, meas, gt[0], dtype=jnp.float64)
    return obj, init


def test_pcg_delta_matches_direct():
    obj, init = build()
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, 2)
    aux = co.build_aux(values, 2)
    from theseus_tpu.optim.normal import SparseNormalBuilder

    ns_d = SparseNormalBuilder(co).build(state, aux)
    ns_p = SparseNormalBuilder(co, solver="pcg", pcg_iters=200).build(state, aux)
    for damping in (0.0, 1e-2):
        dd, _ = ns_d.solve(damping, False)
        dp, _ = ns_p.solve(damping, False)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dd), rtol=1e-6, atol=1e-8)


def test_pcg_end_to_end_and_gradients():
    obj, init = build(n=8, batch=1)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, 1)

    grads = {}
    sols = {}
    for solver in ("direct", "pcg"):
        opt = tt.GaussNewton(obj, max_iterations=6, linearization="sparse",
                             sparse_solver=solver, pcg_iters=150)
        layer = tt.TheseusLayer(opt)

        def f(theta):
            aux = co.build_aux(values, 1)
            aux = jax.tree_util.tree_map(lambda a: a * theta, aux)
            carry = layer.solve_state(state, aux, "implicit", opt.opts)
            return jnp.sum(carry["state"]["SE3"] ** 2), carry["state"]["SE3"]

        (val, sol), g = jax.value_and_grad(f, has_aux=True)(jnp.asarray(1.1, jnp.float64))
        sols[solver] = np.asarray(sol)
        grads[solver] = float(g)
    # iterative solve: solution/grads agree to the CG tolerance, not machine
    np.testing.assert_allclose(sols["pcg"], sols["direct"], atol=1e-4)
    np.testing.assert_allclose(grads["pcg"], grads["direct"], rtol=1e-3)
