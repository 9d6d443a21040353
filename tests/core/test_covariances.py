"""TheseusLayer.compute_covariances: exact marginal covariance blocks from
every backend (dense inverse, sparse factor-reuse unit solves, GBP beliefs),
all checked against the dense-inverse oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.lie import se2


def _chain(n=5, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    gt_t, cur = [], np.zeros((batch, 3))
    for _ in range(n):
        gt_t.append(cur.copy())
        cur = cur + rng.normal(scale=0.4, size=(batch, 3))
    gt = [se2.exp(jnp.asarray(t)) for t in gt_t]
    obj = tt.Objective(dtype=jnp.float64)
    poses = [
        tt.SE2(
            tensor=se2.exp(
                jnp.asarray(gt_t[i] + rng.normal(scale=0.1, size=(batch, 3)))
            ),
            name=f"x{i}",
        )
        for i in range(n)
    ]
    obj.add(tt.Difference(poses[0], tt.SE2(tensor=gt[0], name="pt"),
                          tt.ScaleCostWeight(10.0), name="prior"))
    edges = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
    for (i, j) in edges:
        meas = se2.compose(se2.inverse(gt[i]), gt[j])
        obj.add(tt.Between(poses[i], poses[j],
                           tt.SE2(tensor=meas, name=f"m{i}_{j}"),
                           tt.ScaleCostWeight(1.0), name=f"e{i}_{j}"))
    return obj


def _oracle(obj, values, damping=0.0):
    co = obj.compile()
    b = co.resolve_batch_size(values)
    state, aux = co.pack(values, b), co.build_aux(values, b)
    from theseus_tpu.optim.normal import DenseNormalBuilder

    ns = DenseNormalBuilder(co).build(state, aux)
    H = np.asarray(ns.AtA) + damping * np.eye(ns.AtA.shape[-1])
    cov = np.linalg.inv(H)
    out, off = {}, 0
    for n in co.var_names:
        dv = co.var_groups[n].dof
        out[n] = cov[:, off : off + dv, off : off + dv]
        off += dv
    return out


@pytest.mark.parametrize("linearization", ["dense", "sparse"])
def test_covariances_match_oracle(linearization):
    obj = _chain()
    opt = tt.GaussNewton(obj, max_iterations=8, linearization=linearization)
    layer = tt.TheseusLayer(opt)
    out, _ = opt.optimize()
    covs = layer.compute_covariances(values=out, damping=1e-6)
    want = _oracle(obj, out, damping=1e-6)
    for n in want:
        np.testing.assert_allclose(
            np.asarray(covs[n]), want[n], rtol=1e-6, atol=1e-10
        )


def test_covariances_gbp_backend_tree():
    """GBP beliefs are exact marginals on a tree."""
    obj = _chain(n=4)
    obj.erase("e0_3")  # remove the loop closure -> tree
    gbp = tt.GaussianBeliefPropagation(
        obj, max_iterations=8, msg_iters=12, msg_damping=0.0, gbp_ridge=1e-12
    )
    layer = tt.TheseusLayer(gbp)
    out, _ = gbp.optimize()
    covs = layer.compute_covariances(values=out)
    want = _oracle(obj, out)
    for n in want:
        np.testing.assert_allclose(
            np.asarray(covs[n]), want[n], rtol=1e-4, atol=1e-8
        )


def test_covariances_var_subset():
    obj = _chain()
    opt = tt.GaussNewton(obj, max_iterations=5, linearization="sparse")
    layer = tt.TheseusLayer(opt)
    out, _ = opt.optimize()
    covs = layer.compute_covariances(values=out, var_names=["x2"],
                                     damping=1e-6)
    assert set(covs) == {"x2"}
    assert covs["x2"].shape == (2, 3, 3)
