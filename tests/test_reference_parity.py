"""Direct numerical parity with the reference implementation (torch, CPU).

Builds the SAME problem in both frameworks and compares: Lie-op outputs,
analytic jacobians, per-iteration GN error histories, and final solutions.
Skipped when the reference checkout isn't available."""

import sys

import numpy as np
import pytest

REFERENCE_PATHS = ["/root/reference", "/root/reference/torchlie", "/root/reference/torchkin"]


def _load_reference():
    for p in REFERENCE_PATHS:
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        import theseus as th  # noqa
        import torch  # noqa

        return th, torch
    except Exception:
        return None, None


th, torch = _load_reference()
pytestmark = pytest.mark.skipif(th is None, reason="reference not available")


def rand_se3(n, seed):
    rng = np.random.RandomState(seed)
    from theseus_tpu import lie
    import jax.numpy as jnp

    w = jnp.asarray(rng.randn(n, 6) * 0.7)
    return np.asarray(lie.SE3.exp(w))


def test_se3_ops_match_reference():
    import jax.numpy as jnp

    from theseus_tpu import lie

    g_np = rand_se3(6, 0)
    h_np = rand_se3(6, 1)
    g_t = torch.tensor(g_np, dtype=torch.float64)
    h_t = torch.tensor(h_np, dtype=torch.float64)

    ref_g = th.SE3(tensor=g_t)
    ref_h = th.SE3(tensor=h_t)

    # log map
    np.testing.assert_allclose(
        np.asarray(lie.SE3.log(jnp.asarray(g_np))),
        ref_g.log_map().numpy(),
        atol=1e-10,
    )
    # compose / inverse / between
    np.testing.assert_allclose(
        np.asarray(lie.SE3.compose(jnp.asarray(g_np), jnp.asarray(h_np))),
        ref_g.compose(ref_h).tensor.numpy(),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(lie.SE3.inverse(jnp.asarray(g_np))),
        ref_g.inverse().tensor.numpy(),
        atol=1e-12,
    )
    # local + jacobians
    jl_ref = []
    loc_ref = ref_g.local(ref_h, jacobians=jl_ref)
    (ja, jb), loc = lie.SE3.jlocal(jnp.asarray(g_np), jnp.asarray(h_np))
    np.testing.assert_allclose(np.asarray(loc), loc_ref.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ja), jl_ref[0].numpy(), atol=1e-9)
    np.testing.assert_allclose(np.asarray(jb), jl_ref[1].numpy(), atol=1e-9)
    # exp jacobian
    w = np.random.RandomState(3).randn(5, 6) * 0.5
    jexp_ref = []
    exp_ref = th.SE3.exp_map(torch.tensor(w, dtype=torch.float64), jacobians=jexp_ref)
    (je,), e = lie.SE3.jexp(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(e), exp_ref.tensor.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(je), jexp_ref[0].numpy(), atol=1e-9)


def test_between_cost_matches_reference():
    import jax.numpy as jnp

    import theseus_tpu as tt
    from theseus_tpu.embodied import Between

    v1_np, v2_np, m_np = rand_se3(4, 2), rand_se3(4, 3), rand_se3(4, 4)
    rv1 = th.SE3(tensor=torch.tensor(v1_np, dtype=torch.float64), name="a")
    rv2 = th.SE3(tensor=torch.tensor(v2_np, dtype=torch.float64), name="b")
    rm = th.SE3(tensor=torch.tensor(m_np, dtype=torch.float64), name="m")
    ref_cost = th.Between(rv1, rv2, rm, th.ScaleCostWeight(1.0))
    ref_jacs, ref_err = ref_cost.jacobians()

    cost = Between(tt.SE3(name="a"), tt.SE3(name="b"), jnp.asarray(m_np))
    import jax

    jacs, err = jax.vmap(lambda a, b, m: cost.jacobians_impl((a, b), (m,)))(
        jnp.asarray(v1_np), jnp.asarray(v2_np), jnp.asarray(m_np)
    )
    np.testing.assert_allclose(np.asarray(err), ref_err.numpy(), atol=1e-10)
    np.testing.assert_allclose(np.asarray(jacs[0]), ref_jacs[0].numpy(), atol=1e-9)
    np.testing.assert_allclose(np.asarray(jacs[1]), ref_jacs[1].numpy(), atol=1e-9)


def test_gn_error_history_matches_reference():
    """Same tiny SE3 PGO in both frameworks: Gauss-Newton error histories
    agree iteration by iteration."""
    import jax.numpy as jnp

    import theseus_tpu as tt
    from theseus_tpu.embodied import Between, Local

    n = 5
    gt = [rand_se3(2, 10 + i) for i in range(n)]
    meas = []
    edges = [(i, i + 1) for i in range(n - 1)] + [(n - 1, 0)]
    rng = np.random.RandomState(42)
    import jax

    from theseus_tpu import lie

    for (i, j) in edges:
        rel = np.asarray(
            jax.vmap(lie.SE3.compose)(
                jax.vmap(lie.SE3.inverse)(jnp.asarray(gt[i])), jnp.asarray(gt[j])
            )
        )
        nz = np.asarray(lie.SE3.exp(jnp.asarray(rng.randn(2, 6) * 0.02)))
        meas.append(np.asarray(jax.vmap(lie.SE3.compose)(jnp.asarray(rel), jnp.asarray(nz))))
    init = [
        np.asarray(
            jax.vmap(lie.SE3.compose)(
                jnp.asarray(gt[i]),
                lie.SE3.exp(jnp.asarray(rng.randn(2, 6) * 0.1)),
            )
        )
        for i in range(n)
    ]

    # ours
    obj = tt.Objective(dtype=jnp.float64)
    poses = [tt.SE3(name=f"p{i}") for i in range(n)]
    obj.add(Local(poses[0], jnp.asarray(gt[0]), tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64)), name="prior"))
    for ei, (i, j) in enumerate(edges):
        obj.add(Between(poses[i], poses[j], jnp.asarray(meas[ei]), name=f"e{ei}"))
    opt = tt.GaussNewton(obj, max_iterations=6)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward({f"p{i}": jnp.asarray(init[i]) for i in range(n)})
    ours_hist = np.asarray(info.err_history)[:, 0]

    # reference
    robj = th.Objective(dtype=torch.float64)
    rposes = [th.SE3(tensor=torch.tensor(init[i], dtype=torch.float64), name=f"p{i}") for i in range(n)]
    rgt0 = th.SE3(tensor=torch.tensor(gt[0], dtype=torch.float64), name="gt0")
    robj.add(th.Difference(rposes[0], rgt0, th.ScaleCostWeight(torch.tensor(10.0, dtype=torch.float64)), name="prior"))
    for ei, (i, j) in enumerate(edges):
        rmeas = th.SE3(tensor=torch.tensor(meas[ei], dtype=torch.float64), name=f"m{ei}")
        robj.add(th.Between(rposes[i], rposes[j], rmeas, th.ScaleCostWeight(torch.tensor(1.0, dtype=torch.float64)), name=f"e{ei}"))
    ropt = th.GaussNewton(robj, max_iterations=6, step_size=1.0, vectorize=True)
    rlayer = th.TheseusLayer(ropt)
    with torch.no_grad():
        _, rinfo = rlayer.forward(
            {f"p{i}": torch.tensor(init[i], dtype=torch.float64) for i in range(n)},
            optimizer_kwargs={"track_err_history": True},
        )
    ref_hist = rinfo.err_history[0].numpy()

    # reference error history is the squared-norm/2 metric as well
    m = min(len(ours_hist), ref_hist.shape[0])
    # compare until both converge (reference pads after convergence; it also
    # stores history at float32, which caps the comparable precision)
    for k in range(min(m, 4)):
        np.testing.assert_allclose(ours_hist[k], ref_hist[k], rtol=1e-6, atol=1e-10)


def test_implicit_gradient_matches_reference():
    """BASELINE.md north star: implicit-mode OUTER GRADIENTS match the
    reference to 1e-6 on the same problem (reference
    optimizer/nonlinear/nonlinear_least_squares.py:117-135 implicit step;
    ours layer.py _implicit_final_step). A learnable scalar edge weight w
    scales all Between costs; loss = <solution poses, fixed M>; compare
    dloss/dw elementwise in f64."""
    import jax
    import jax.numpy as jnp

    import theseus_tpu as tt
    from theseus_tpu.embodied import Between, Local
    from theseus_tpu import lie

    n, bsz = 5, 2
    gt = [rand_se3(bsz, 30 + i) for i in range(n)]
    edges = [(i, i + 1) for i in range(n - 1)] + [(n - 1, 0)]
    rng = np.random.RandomState(7)
    meas = []
    for (i, j) in edges:
        rel = np.asarray(
            jax.vmap(lie.SE3.compose)(
                jax.vmap(lie.SE3.inverse)(jnp.asarray(gt[i])), jnp.asarray(gt[j])
            )
        )
        nz = np.asarray(lie.SE3.exp(jnp.asarray(rng.randn(bsz, 6) * 0.05)))
        meas.append(np.asarray(jax.vmap(lie.SE3.compose)(jnp.asarray(rel), jnp.asarray(nz))))
    init = [
        np.asarray(
            jax.vmap(lie.SE3.compose)(
                jnp.asarray(gt[i]), lie.SE3.exp(jnp.asarray(rng.randn(bsz, 6) * 0.1))
            )
        )
        for i in range(n)
    ]
    M = rng.randn(n, bsz, 3, 4)
    w0 = 1.7

    # ---- ours: jax.grad through implicit mode --------------------------
    obj = tt.Objective(dtype=jnp.float64)
    poses = [tt.SE3(name=f"p{i}") for i in range(n)]
    obj.add(Local(poses[0], jnp.asarray(gt[0]),
                  tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64)),
                  name="prior"))
    w = tt.ScaleCostWeight(jnp.asarray(w0, jnp.float64), name="w")
    for ei, (i, j) in enumerate(edges):
        obj.add(Between(poses[i], poses[j], jnp.asarray(meas[ei]),
                        cost_weight=w, name=f"e{ei}"))
    opt = tt.GaussNewton(obj, max_iterations=12)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()

    def f(wval):
        values = obj.default_values(
            {f"p{i}": jnp.asarray(init[i]) for i in range(n)}
        )
        values[w.scale.name] = wval.reshape(1, 1)
        state = co.pack(values, bsz)
        aux = co.build_aux(values, bsz)
        carry = layer.solve_state(state, aux, "implicit", opt.opts)
        sol = co.unpack(carry["state"])
        return sum(
            jnp.sum(sol[f"p{i}"] * jnp.asarray(M[i])) for i in range(n)
        )

    g_ours = float(jax.grad(f)(jnp.asarray(w0, jnp.float64)))

    # ---- reference: torch autograd through BackwardMode.IMPLICIT -------
    robj = th.Objective(dtype=torch.float64)
    rposes = [
        th.SE3(tensor=torch.tensor(init[i], dtype=torch.float64), name=f"p{i}")
        for i in range(n)
    ]
    rgt0 = th.SE3(tensor=torch.tensor(gt[0], dtype=torch.float64), name="gt0")
    robj.add(th.Difference(rposes[0], rgt0,
                           th.ScaleCostWeight(torch.tensor(10.0, dtype=torch.float64)),
                           name="prior"))
    rw = th.ScaleCostWeight(torch.tensor(w0, dtype=torch.float64), name="w")
    for ei, (i, j) in enumerate(edges):
        rmeas = th.SE3(tensor=torch.tensor(meas[ei], dtype=torch.float64), name=f"m{ei}")
        robj.add(th.Between(rposes[i], rposes[j], rmeas, rw, name=f"e{ei}"))
    ropt = th.GaussNewton(robj, max_iterations=12, step_size=1.0, vectorize=True)
    rlayer = th.TheseusLayer(ropt)

    w_t = torch.tensor([[w0]], dtype=torch.float64, requires_grad=True)
    inputs = {f"p{i}": torch.tensor(init[i], dtype=torch.float64) for i in range(n)}
    inputs[rw.scale.name] = w_t
    sol, _ = rlayer.forward(
        inputs, optimizer_kwargs={"backward_mode": "implicit"}
    )
    loss = sum(
        (sol[f"p{i}"] * torch.tensor(M[i], dtype=torch.float64)).sum()
        for i in range(n)
    )
    loss.backward()
    g_ref = float(w_t.grad)

    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-6, atol=1e-9)
