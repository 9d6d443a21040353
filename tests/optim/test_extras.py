"""Tests for DCEM, LML, ManifoldGaussian, GNC robust costs, and LEO
posterior sampling (compute_samples)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.optim.dcem import DCEM
from theseus_tpu.optim.gaussian import ManifoldGaussian, local_gaussian, retract_gaussian
from theseus_tpu.optim.lml import lml


def test_lml_forward_properties():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 20), dtype=jnp.float64)
    y = lml(x, 5)
    s = np.asarray(jnp.sum(y, axis=-1))
    np.testing.assert_allclose(s, 5.0, atol=1e-6)
    assert np.all((np.asarray(y) > 0) & (np.asarray(y) < 1))
    # top-5 entries get the largest weights
    xi = np.asarray(x[0])
    yi = np.asarray(y[0])
    top = np.argsort(-xi)[:5]
    assert set(np.argsort(-yi)[:5]) == set(top)


def test_lml_gradients_match_fd():
    x0 = jax.random.normal(jax.random.PRNGKey(1), (3, 10), dtype=jnp.float64)

    def f(x):
        return jnp.sum(jnp.cos(lml(x, 3)) * x)

    g = jax.grad(f)(x0)
    rng = np.random.RandomState(0)
    for _ in range(3):
        d = jnp.asarray(rng.randn(*x0.shape))
        h = 1e-6
        fd = (f(x0 + h * d) - f(x0 - h * d)) / (2 * h)
        np.testing.assert_allclose(jnp.sum(g * d), fd, rtol=1e-5, atol=1e-8)


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


def test_dcem_converges_on_quadratic():
    obj, target, dim, batch = quad_objective()
    opt = DCEM(obj, max_iterations=40, n_sample=120, n_elite=8, init_sigma=1.0)
    values, info = opt.optimize(
        input_tensors={"x": jnp.zeros((batch, dim), jnp.float64)},
        key=jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(values["x"], target, atol=0.05)


def test_dcem_differentiable():
    """Gradient of the DCEM solution wrt the target flows (the soft top-k
    keeps the whole loop differentiable)."""
    obj, target, dim, batch = quad_objective(batch=1)
    opt = DCEM(obj, max_iterations=10, n_sample=50, n_elite=5)
    co = obj.compile()

    def f(theta):
        values = obj.default_values({"x": jnp.zeros((1, dim), jnp.float64),
                                     "target": theta * target[:1]})
        state = co.pack(values, 1)
        aux = co.build_aux(values, 1)
        carry = opt.solve(state, aux, jax.random.PRNGKey(0))
        return jnp.sum(co.unpack(carry["state"])["x"])

    g = jax.grad(f)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(np.asarray(g)) and abs(float(g)) > 1e-3


@pytest.mark.parametrize("group", [tt.SO3(name="a").group, tt.SE2(name="b").group])
def test_gaussian_local_retract_roundtrip(group):
    key1, key2 = jax.random.split(jax.random.PRNGKey(4))
    var = group.rand(key1, dtype=jnp.float64)
    mean = group.rand(key2, dtype=jnp.float64)
    prec = jnp.eye(group.dof, dtype=jnp.float64) * 2.0
    gau = ManifoldGaussian(mean=[mean], precision=prec)
    mean_tp, lam_tp = local_gaussian(group, var, gau)
    back = retract_gaussian(group, var, mean_tp, lam_tp)
    np.testing.assert_allclose(back.mean[0], mean, atol=1e-9)
    np.testing.assert_allclose(back.precision, prec, atol=1e-8)


def test_gnc_robust_cost():
    """Large mu ~ quadratic; mu = 1 downweights outliers."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 20)))
    y = 2.0 * x + 1.0
    y = y.at[:, 0].add(30.0)  # outlier
    v = tt.Vector(2, name="ab")

    def err_fn(optim, aux):
        (ab,) = optim
        xx, yy = aux
        return yy - (ab[0] * xx + ab[1])

    base = tt.AutoDiffCostFunction(
        [v], 20, err_fn,
        aux_vars=[tt.Variable(x, name="x"), tt.Variable(y, name="y")],
    )
    mu_var = tt.Variable(jnp.asarray([[1.0]]), name="mu")
    cost = tt.GNCRobustCostFunction(
        base, tt.GemanMcClureLoss, jnp.log(jnp.asarray([[1.0]])), mu_var,
        flatten_dims=True,
    )
    obj = tt.Objective(dtype=jnp.float64)
    obj.add(cost)
    layer = tt.TheseusLayer(tt.LevenbergMarquardt(obj, max_iterations=40, adaptive_damping=True))

    # GNC annealing: start near-quadratic, anneal mu toward 1
    values = {"ab": jnp.zeros((1, 2), jnp.float64)}
    for mu in (1e6, 100.0, 10.0, 1.0):
        values["mu"] = jnp.asarray([[mu]], jnp.float64)
        values, info = layer.forward(values)
    ab = np.asarray(values["ab"])
    np.testing.assert_allclose(ab, [[2.0, 1.0]], atol=0.1)


def test_compute_samples():
    obj, target, dim, batch = quad_objective()
    opt = tt.GaussNewton(obj, max_iterations=5)
    layer = tt.TheseusLayer(opt)
    values, _ = layer.forward({"x": jnp.zeros((batch, dim), jnp.float64)})
    samples = layer.compute_samples(values=values, n_samples=64,
                                    temperature=1.0, key=jax.random.PRNGKey(5))
    s = np.asarray(samples["x"])  # (B, S, dim)
    assert s.shape == (batch, 64, dim)
    # mean of samples ~ solution; cov ~ (J^T J)^{-1} = I for unit residuals
    np.testing.assert_allclose(s.mean(axis=1), np.asarray(target), atol=0.5)
    std = s.std(axis=1)
    np.testing.assert_allclose(std, 1.0, atol=0.45)


def test_autograd_mode_fwd_rev_agree():
    """autograd_mode='rev' produces the same tangent jacobians as 'fwd'
    (the reference's AutogradMode ablation axis, core/cost_function.py:161)."""
    key = jax.random.PRNGKey(3)
    x = tt.SE3(name="x")
    tv = tt.Variable(jnp.ones((1, 3)), name="t")

    def err_fn(optim, aux):
        (g,) = optim
        (t,) = aux
        from theseus_tpu.lie import se3
        return se3.transform(g, t) - t

    jacs = {}
    for mode in ("fwd", "rev"):
        cf = tt.AutoDiffCostFunction([x], 3, err_fn, aux_vars=[tv],
                                     autograd_mode=mode)
        obj = tt.Objective()
        obj.add(cf)
        co = obj.compile()
        from theseus_tpu.lie import se3 as se3m
        vals = {"x": se3m.exp(0.3 * jax.random.normal(key, (1, 6))),
                "t": jnp.ones((1, 3))}
        state = co.pack(obj.default_values(vals), 1)
        aux = co.build_aux(obj.default_values(vals), 1)
        blocks = co.linearize_blocks(state, aux)
        jacs[mode] = np.asarray(blocks[0][0][0])
    np.testing.assert_allclose(jacs["fwd"], jacs["rev"], rtol=1e-10, atol=1e-12)
    with pytest.raises(ValueError):
        tt.AutoDiffCostFunction([x], 3, err_fn, autograd_mode="bogus")
