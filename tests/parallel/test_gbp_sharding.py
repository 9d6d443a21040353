"""GBP under batch-axis sharding: messages are per-(factor, batch) arrays,
so the whole message-passing schedule shards along the batch dimension with
zero cross-device traffic inside a sweep — parity with the unsharded solve
is exact up to f32 reduction order."""

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.lie import se2
from theseus_tpu.parallel import make_mesh, shard_problem


def _problem(batch=8, n=6, seed=0):
    rng = np.random.default_rng(seed)
    gt_t, cur = [], np.zeros((batch, 3))
    for _ in range(n):
        gt_t.append(cur.copy())
        cur = cur + rng.normal(scale=0.4, size=(batch, 3))
    gt = [se2.exp(jnp.asarray(t, jnp.float32)) for t in gt_t]

    obj = tt.Objective()
    poses = [
        tt.SE2(
            tensor=se2.exp(
                jnp.asarray(
                    gt_t[i] + rng.normal(scale=0.15, size=(batch, 3)),
                    jnp.float32,
                )
            ),
            name=f"x{i}",
        )
        for i in range(n)
    ]
    obj.add(
        tt.Difference(
            poses[0], tt.SE2(tensor=gt[0], name="prior_t"),
            tt.ScaleCostWeight(10.0), name="prior",
        )
    )
    edges = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
    for (i, j) in edges:
        meas = se2.compose(se2.inverse(gt[i]), gt[j])
        obj.add(
            tt.Between(
                poses[i], poses[j], tt.SE2(tensor=meas, name=f"m{i}_{j}"),
                tt.ScaleCostWeight(1.0), name=f"e{i}_{j}",
            )
        )
    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=8, msg_iters=25, msg_damping=0.3
    )
    layer = tt.TheseusLayer(gbp)
    co = obj.compile()
    values = obj.default_values()
    b = co.resolve_batch_size(values)
    return layer, co, co.pack(values, b), co.build_aux(values, b)


def test_gbp_sharded_solution_parity():
    layer, co, state, aux = _problem(batch=8)
    opts = layer.optimizer.opts

    @jax.jit
    def solve(state, aux):
        return layer.solve_state(state, aux, "implicit", opts)

    ref = solve(state, aux)
    mesh = make_mesh(8)
    sh_state, sh_aux = shard_problem(co, state, aux, mesh)
    with mesh:
        out = solve(sh_state, sh_aux)
    np.testing.assert_allclose(
        np.asarray(out["state"]["SE2"]), np.asarray(ref["state"]["SE2"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["err"]), np.asarray(ref["err"]), rtol=1e-4, atol=1e-7
    )
    assert len(out["state"]["SE2"].sharding.device_set) == 8
