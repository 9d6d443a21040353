"""DLM perturbation math (reference tests/theseus_tests/test_dlm_perturbation.py
pins the perturbed-objective construction; here we pin the equivalent
custom-vjp formulation directly):

1. On a LINEAR least-squares problem the DLM backward is exact up to
   roundoff: x*(theta) = argmin 0.5||A x - b(theta)||^2 is affine in theta,
   the one-GN-step perturbation solves the perturbed problem exactly, and
   central differences cancel the quadratic term.
2. Cotangent-scale invariance: scaling the outer loss by c must scale the
   DLM gradient by exactly c (the normalization folds ||g|| out of the
   finite-difference step; the raw scheme loses accuracy for ||g|| far
   from 1).
3. On a manifold (SO3) problem, DLM must agree with the implicit-mode
   gradient to FD-level tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt


def _linear_problem(theta, n=4):
    """x* = argmin 0.5||x - t(theta)||^2 + 0.5||B x||^2, t affine in theta."""
    obj = tt.Objective(dtype=jnp.float64)
    x = tt.Vector(dof=n, name="x")
    t = jnp.arange(1.0, n + 1.0)[None] * theta  # (1, n)
    obj.add(tt.Local(x, tt.Variable(t, name="target"),
                     tt.ScaleCostWeight(1.0), name="fit"))
    obj.add(tt.Local(x, tt.Variable(jnp.zeros((1, n)), name="zero"),
                     tt.ScaleCostWeight(0.7), name="reg"))
    return obj


def _dlm_grad(loss_scale=1.0):
    def f(theta):
        obj = _linear_problem(theta)
        opt = tt.GaussNewton(obj, max_iterations=3)
        layer = tt.TheseusLayer(opt)
        co = obj.compile()
        values = obj.default_values({"x": jnp.zeros((1, 4))})
        values["target"] = jnp.arange(1.0, 5.0)[None] * theta
        state = co.pack(values, 1)
        aux = co.build_aux(values, 1)
        carry = layer.solve_state(state, aux, "dlm", opt.opts)
        sol = co.unpack(carry["state"])["x"]
        return loss_scale * jnp.sum(sol**3)  # nonlinear outer loss

    return f


def test_dlm_exact_on_linear_problem():
    theta = jnp.asarray(0.8, jnp.float64)
    f = _dlm_grad()
    g = jax.grad(f)(theta)
    h = 1e-6
    fd = (f(theta + h) - f(theta - h)) / (2 * h)
    # central differences through an exactly-solved linear system: the only
    # error left is roundoff
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-7)


@pytest.mark.parametrize("scale", [1e-6, 1.0, 1e6])
def test_dlm_cotangent_scale_invariance(scale):
    theta = jnp.asarray(0.8, jnp.float64)
    g1 = jax.grad(_dlm_grad(1.0))(theta)
    gs = jax.grad(_dlm_grad(scale))(theta)
    # the normalized FD step makes this exact in the linear-solve regime;
    # the un-normalized scheme breaks down at 1e-6/1e6 scales
    np.testing.assert_allclose(float(gs), scale * float(g1), rtol=1e-6)


def test_dlm_matches_implicit_on_so3():
    def make(mode):
        def f(theta):
            obj = tt.Objective(dtype=jnp.float64)
            r = tt.SO3(name="r")
            from theseus_tpu.lie import so3

            target = so3.exp(jnp.stack([theta, 0.3 + 0 * theta, 0.1 + 0 * theta])[None])
            obj.add(tt.Local(r, tt.Variable(target, name="target"),
                             tt.ScaleCostWeight(1.0), name="fit"))
            opt = tt.GaussNewton(obj, max_iterations=6)
            layer = tt.TheseusLayer(opt)
            co = obj.compile()
            values = obj.default_values(
                {"r": jnp.eye(3, dtype=jnp.float64)[None]})
            values["target"] = target
            state = co.pack(values, 1)
            aux = co.build_aux(values, 1)
            carry = layer.solve_state(state, aux, mode, opt.opts)
            sol = co.unpack(carry["state"])["r"]
            return jnp.sum(sol * jnp.arange(9.0).reshape(3, 3))

        return f

    theta = jnp.asarray(0.4, jnp.float64)
    g_dlm = jax.grad(make("dlm"))(theta)
    g_imp = jax.grad(make("implicit"))(theta)
    np.testing.assert_allclose(float(g_dlm), float(g_imp), rtol=1e-5)
