"""Layer-level feature tests added in round 2: DCEM through TheseusLayer,
user-facing batch_ignore_mask, track_state_history, sparse compute_samples,
and the bare-optimizer jit cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.optim.dcem import DCEM


def quad_objective(batch=3, dim=4, seed=0):
    rng = np.random.RandomState(seed)
    target = jnp.asarray(rng.uniform(-1, 1, size=(batch, dim)))
    v = tt.Vector(dim, name="x")
    tv = tt.Variable(target, name="target")

    def err_fn(optim, aux):
        (x,) = optim
        (t,) = aux
        return x - t

    obj = tt.Objective(dtype=jnp.float64)
    obj.add(tt.AutoDiffCostFunction([v], dim, err_fn, aux_vars=[tv]))
    return obj, target, dim, batch


# ---------------------------------------------------------------------------
# DCEM through TheseusLayer (reference dcem.py:26,160 + test_theseus_layer)
# ---------------------------------------------------------------------------
def test_dcem_layer_forward_converges():
    obj, target, dim, batch = quad_objective()
    opt = DCEM(obj, max_iterations=40, n_sample=120, n_elite=8, init_sigma=1.0,
               key=jax.random.PRNGKey(3))
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward({"x": jnp.zeros((batch, dim), jnp.float64)})
    np.testing.assert_allclose(values["x"], target, atol=0.05)
    assert np.all(np.asarray(info.last_err) < 1e-2)


def test_dcem_layer_truncated_grad():
    """Truncated backward through layer+DCEM: gradient of the solution wrt
    the target aux flows and is nonzero."""
    obj, target, dim, batch = quad_objective(batch=1)
    opt = DCEM(obj, max_iterations=10, n_sample=50, n_elite=5,
               key=jax.random.PRNGKey(0))
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    opts = opt.opts

    def f(theta):
        values = obj.default_values({"x": jnp.zeros((1, dim), jnp.float64),
                                     "target": theta * target[:1]})
        state = co.pack(values, 1)
        aux = co.build_aux(values, 1)
        carry = layer.solve_state(state, aux, "truncated", opts,
                                  backward_num_iterations=4)
        return jnp.sum(co.unpack(carry["state"])["x"])

    g = jax.grad(f)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(np.asarray(g)) and abs(float(g)) > 1e-3


def test_dcem_hard_topk_converges():
    """temp=None -> hard top-k elite selection (reference dcem.py:135-141)."""
    obj, target, dim, batch = quad_objective()
    opt = DCEM(obj, max_iterations=40, n_sample=120, n_elite=8, temp=None,
               init_sigma=1.0, key=jax.random.PRNGKey(7))
    values, info = opt.optimize(
        input_tensors={"x": jnp.zeros((batch, dim), jnp.float64)}
    )
    np.testing.assert_allclose(values["x"], target, atol=0.05)


def test_dcem_rejects_gradient_modes():
    obj, *_ = quad_objective()
    layer = tt.TheseusLayer(DCEM(obj, max_iterations=5))
    with pytest.raises(ValueError, match="supports backward modes"):
        layer.forward({"x": jnp.zeros((3, 4), jnp.float64)},
                      optimizer_kwargs={"backward_mode": "implicit"})


# ---------------------------------------------------------------------------
# batch_ignore_mask (reference core/variable.py:65-71, objective.py:729)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["unroll", "implicit", "truncated", "dlm"])
def test_batch_ignore_mask_freezes_elements(mode):
    obj, target, dim, batch = quad_objective()
    opt = tt.GaussNewton(obj, max_iterations=5)
    layer = tt.TheseusLayer(opt)
    x0 = jnp.asarray(np.random.RandomState(1).randn(batch, dim))
    mask = jnp.asarray([True, False, True])
    values, info = layer.forward(
        {"x": x0},
        optimizer_kwargs={"backward_mode": mode, "batch_ignore_mask": mask},
    )
    x = np.asarray(values["x"])
    # frozen elements are bit-identical to their inputs
    np.testing.assert_array_equal(x[0], np.asarray(x0)[0])
    np.testing.assert_array_equal(x[2], np.asarray(x0)[2])
    # unfrozen element solved
    np.testing.assert_allclose(x[1], np.asarray(target)[1], atol=1e-8)
    assert int(info.status[0]) == tt.NonlinearOptimizerStatus.START
    assert int(info.status[1]) == tt.NonlinearOptimizerStatus.CONVERGED


def test_batch_ignore_mask_bare_optimizer():
    obj, target, dim, batch = quad_objective()
    opt = tt.LevenbergMarquardt(obj, max_iterations=8)
    x0 = jnp.asarray(np.random.RandomState(2).randn(batch, dim))
    mask = jnp.asarray([False, True, False])
    values, info = opt.optimize(
        input_tensors={"x": x0}, batch_ignore_mask=mask
    )
    x = np.asarray(values["x"])
    np.testing.assert_array_equal(x[1], np.asarray(x0)[1])
    np.testing.assert_allclose(x[0], np.asarray(target)[0], atol=1e-6)


# ---------------------------------------------------------------------------
# track_state_history (reference nonlinear_optimizer.py:131-176)
# ---------------------------------------------------------------------------
def test_track_state_history():
    obj, target, dim, batch = quad_objective()
    opt = tt.GaussNewton(obj, max_iterations=4, track_state_history=True)
    x0 = jnp.zeros((batch, dim), jnp.float64)
    values, info = opt.optimize(input_tensors={"x": x0})
    assert info.state_history is not None
    hist = np.asarray(info.state_history["Rn4"])  # (iters+1, N, B, dim)
    assert hist.shape[0] == 5
    np.testing.assert_allclose(hist[0, 0], np.asarray(x0), atol=0)
    # GN on a linear problem converges in one step; iteration 1 = solution
    np.testing.assert_allclose(hist[1, 0], np.asarray(target), atol=1e-9)


# ---------------------------------------------------------------------------
# sparse compute_samples (reference theseus_layer.py:99-135, LEO)
# ---------------------------------------------------------------------------
def _chain_objective(batch=2, dim=3):
    """Two vector variables with a prior + a between cost -> block-sparse
    AtA with an off-diagonal block."""
    rng = np.random.RandomState(4)
    t0 = jnp.asarray(rng.randn(batch, dim))
    d01 = jnp.asarray(rng.randn(batch, dim))
    x0 = tt.Vector(dim, name="x0")
    x1 = tt.Vector(dim, name="x1")

    def prior(optim, aux):
        return optim[0] - aux[0]

    def between(optim, aux):
        return optim[1] - optim[0] - aux[0]

    obj = tt.Objective(dtype=jnp.float64)
    obj.add(tt.AutoDiffCostFunction(
        [x0], dim, prior, aux_vars=[tt.Variable(t0, name="t0")], name="prior"))
    obj.add(tt.AutoDiffCostFunction(
        [x0, x1], dim, between, aux_vars=[tt.Variable(d01, name="d01")],
        name="between"))
    return obj, t0, d01, dim, batch


def test_compute_samples_sparse_matches_dense_cov():
    obj, t0, d01, dim, batch = _chain_objective()
    opt = tt.GaussNewton(obj, max_iterations=5, linearization="sparse")
    layer = tt.TheseusLayer(opt)
    z = jnp.zeros((batch, dim), jnp.float64)
    values, _ = layer.forward({"x0": z, "x1": z})
    n_s = 4000
    samples = layer.compute_samples(values=values, n_samples=n_s,
                                    key=jax.random.PRNGKey(11))
    assert set(samples) >= {"x0", "x1"}
    s = np.concatenate(
        [np.asarray(samples["x0"]), np.asarray(samples["x1"])], axis=-1
    )  # (B, S, 2*dim)
    # analytic covariance of the 2-var chain: AtA = [[2I, -I], [-I, I]]
    ata = np.block([
        [2 * np.eye(dim), -np.eye(dim)],
        [-np.eye(dim), np.eye(dim)],
    ])
    cov_true = np.linalg.inv(ata)
    for b in range(batch):
        emp = np.cov(s[b].T)
        np.testing.assert_allclose(emp, cov_true, atol=0.15)
        # mean == solution (x0=t0, x1=t0+d01)
        np.testing.assert_allclose(
            s[b].mean(axis=0),
            np.concatenate([np.asarray(t0[b]), np.asarray(t0[b] + d01[b])]),
            atol=0.1,
        )


# ---------------------------------------------------------------------------
# optimize() jit caching
# ---------------------------------------------------------------------------
def test_optimize_jit_cached():
    obj, target, dim, batch = quad_objective()
    opt = tt.GaussNewton(obj, max_iterations=5)
    x0 = jnp.zeros((batch, dim), jnp.float64)
    opt.optimize(input_tensors={"x": x0})
    opt.optimize(input_tensors={"x": x0})
    assert len(opt._jit_cache) == 1
