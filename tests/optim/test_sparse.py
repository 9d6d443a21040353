"""Sparse block Cholesky tests: direct solver correctness vs dense reference
(the reference's "void objective" style, tests/theseus_tests/optimizer/
autograd/test_sparse_backward.py:30-46), end-to-end PGO parity dense vs
sparse, and gradients through the factorization-reusing custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu import lie
from theseus_tpu.sparse.assemble import BlockPattern
from theseus_tpu.sparse.cholesky import NumericSchedule, factorize, solve_with_factor, sparse_block_solve
from theseus_tpu.sparse.structure import symbolic_factor


def random_block_system(n, d, bsz, density=0.3, seed=0):
    """Random SPD block system; returns (pattern-ish dicts, dense H, b)."""
    rng = np.random.RandomState(seed)
    pairs = set()
    for i in range(n):
        for j in range(i + 1, n):
            if rng.rand() < density:
                pairs.add((i, j))
    # dense SPD
    m = rng.randn(bsz, n * d, n * d) * 0.3
    H = np.einsum("bij,bkj->bik", m, m) + np.eye(n * d) * (n * d)
    # zero out non-pattern blocks
    mask = np.zeros((n, n), dtype=bool)
    np.fill_diagonal(mask, True)
    for i, j in pairs:
        mask[i, j] = mask[j, i] = True
    for i in range(n):
        for j in range(n):
            if not mask[i, j]:
                H[:, i * d : (i + 1) * d, j * d : (j + 1) * d] = 0
    # re-SPD via diagonal dominance
    H = 0.5 * (H + H.transpose(0, 2, 1))
    H += np.eye(n * d) * np.abs(H).sum(-1).max() * 0.1
    b = rng.randn(bsz, n * d)
    return pairs, H, b


def blocks_from_dense(pair_slot, n_slots, H, n, d):
    bsz = H.shape[0]
    ata = np.zeros((n_slots, bsz, d, d))
    for (i, j), s in pair_slot.items():
        ata[s] = H[:, i * d : (i + 1) * d, j * d : (j + 1) * d]
    return jnp.asarray(ata)


@pytest.mark.parametrize("ordering", ["natural", "amd", "rcm"])
@pytest.mark.parametrize("n,d,bsz", [(6, 3, 2), (12, 6, 3), (20, 2, 1)])
def test_block_cholesky_matches_dense(n, d, bsz, ordering):
    pairs, H, b = random_block_system(n, d, bsz, seed=n + d)
    sym = symbolic_factor(n, pairs, d, ordering=ordering)

    # minimal pattern shim (pair_slot for stored blocks incl. diagonal)
    pair_slot = {}
    slot = 1
    for i in range(n):
        pair_slot[(i, i)] = slot
        slot += 1
    for (i, j) in sorted(pairs):
        pair_slot[(i, j)] = slot
        slot += 1

    class Shim:
        pass

    pattern = Shim()
    pattern.pair_slot = pair_slot
    pattern.n_vars = n
    pattern.d = d
    sched = NumericSchedule(sym, pattern)

    ata = blocks_from_dense(pair_slot, slot, H, n, d)
    bb = jnp.asarray(b.reshape(bsz, n, d).transpose(1, 0, 2))
    x = sparse_block_solve(sched, ata, bb)
    x_flat = np.asarray(jnp.moveaxis(x, 0, 1).reshape(bsz, n * d))
    expected = np.linalg.solve(H, b[..., None])[..., 0]
    np.testing.assert_allclose(x_flat, expected, rtol=1e-8, atol=1e-8)


def test_block_solve_custom_vjp():
    """Gradcheck equivalent (reference uses torch.autograd.gradcheck on the
    sparse solve functions): compare custom-VJP grads to finite differences."""
    n, d, bsz = 5, 2, 2
    pairs, H, b = random_block_system(n, d, bsz, seed=7)
    sym = symbolic_factor(n, pairs, d, ordering="amd")
    pair_slot = {}
    slot = 1
    for i in range(n):
        pair_slot[(i, i)] = slot
        slot += 1
    for (i, j) in sorted(pairs):
        pair_slot[(i, j)] = slot
        slot += 1

    class Shim:
        pass

    pattern = Shim()
    pattern.pair_slot = pair_slot
    pattern.n_vars = n
    pattern.d = d
    sched = NumericSchedule(sym, pattern)
    ata0 = blocks_from_dense(pair_slot, slot, H, n, d)
    bb0 = jnp.asarray(b.reshape(bsz, n, d).transpose(1, 0, 2))

    def f(ata, bb):
        x = sparse_block_solve(sched, ata, bb)
        return jnp.sum(jnp.sin(x) * x)

    g_ata, g_bb = jax.grad(f, argnums=(0, 1))(ata0, bb0)

    rng = np.random.RandomState(3)
    # FD along random directions
    for _ in range(3):
        da = jnp.asarray(rng.randn(*ata0.shape)) * (np.asarray(ata0) != 0)
        db = jnp.asarray(rng.randn(*bb0.shape))
        h = 1e-6
        fd = (f(ata0 + h * da, bb0 + h * db) - f(ata0 - h * da, bb0 - h * db)) / (2 * h)
        an = jnp.sum(g_ata * da) + jnp.sum(g_bb * db)
        np.testing.assert_allclose(an, fd, rtol=1e-5, atol=1e-7)


def build_pgo(n_poses=10, batch=2, seed=0, mixed=False):
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 3 * n_poses + 2)
    g = lie.SE3
    gt = [g.identity(batch, dtype=jnp.float64)]
    for i in range(1, n_poses):
        step = g.exp(0.4 * jax.random.normal(keys[i], (batch, 6), dtype=jnp.float64))
        gt.append(jax.vmap(g.compose)(gt[-1], step))
    obj = tt.Objective(dtype=jnp.float64)
    poses = [tt.SE3(name=f"pose_{i}") for i in range(n_poses)]
    obj.add(tt.Local(poses[0], gt[0], tt.ScaleCostWeight(jnp.asarray(10.0, jnp.float64)), name="prior"))
    edges = [(i, i + 1) for i in range(n_poses - 1)] + [(n_poses - 1, 0), (0, n_poses // 2)]
    for ei, (i, j) in enumerate(edges):
        rel = jax.vmap(g.compose)(jax.vmap(g.inverse)(gt[i]), gt[j])
        nz = g.exp(0.05 * jax.random.normal(keys[n_poses + ei % n_poses], (batch, 6), dtype=jnp.float64))
        obj.add(tt.Between(poses[i], poses[j], jax.vmap(g.compose)(rel, nz), name=f"e{ei}"))
    if mixed:
        # add a Point3 landmark seen from two poses (mixed dof 6/3)
        lm = tt.Point3(name="lm0")
        p_w = jax.random.normal(keys[-1], (batch, 3), dtype=jnp.float64)

        def lm_err(optim, aux):
            pose, pt = optim
            (obs,) = aux
            return lie.se3.untransform(pose, pt) - obs

        for pi in (0, 1):
            obs = jax.vmap(lie.se3.untransform)(gt[pi], p_w)
            obj.add(tt.AutoDiffCostFunction([poses[pi], lm], 3, lm_err,
                                            aux_vars=[tt.Variable(obs, name=f"obs{pi}")],
                                            name=f"lmcost{pi}"))
    init = {
        f"pose_{i}": jax.vmap(g.compose)(
            gt[i], g.exp(0.2 * jax.random.normal(keys[2 * n_poses + i % n_poses], (batch, 6), dtype=jnp.float64))
        )
        for i in range(n_poses)
    }
    if mixed:
        init["lm0"] = jnp.zeros((batch, 3), jnp.float64)
    return obj, init


@pytest.mark.parametrize("mixed", [False, True], ids=["uniform", "mixed-dof"])
def test_sparse_matches_dense_pgo(mixed):
    obj, init = build_pgo(mixed=mixed)
    sol = {}
    for lin in ("dense", "sparse"):
        opt = tt.GaussNewton(obj, max_iterations=12, linearization=lin)
        layer = tt.TheseusLayer(opt)
        values, info = layer.forward(init)
        sol[lin] = values
        assert np.all(np.asarray(info.status) != tt.NonlinearOptimizerStatus.FAIL)
    for k in sol["dense"]:
        np.testing.assert_allclose(sol["dense"][k], sol["sparse"][k], atol=1e-7)


@pytest.mark.parametrize("opt_cls,kw", [
    (tt.LevenbergMarquardt, {"adaptive_damping": True, "ellipsoidal_damping": True}),
    (tt.Dogleg, {}),
])
def test_sparse_lm_dogleg(opt_cls, kw):
    obj, init = build_pgo()
    opt = opt_cls(obj, max_iterations=25, linearization="sparse", **kw)
    layer = tt.TheseusLayer(opt)
    values, info = layer.forward(init)
    init_err = np.asarray(obj.error_metric(values=obj.default_values(init)))
    final_err = np.asarray(obj.error_metric(values=values))
    assert np.all(final_err < 0.05 * init_err)


@pytest.mark.parametrize("mode", ["unroll", "implicit", "truncated", "dlm"])
def test_sparse_backward_modes(mode):
    """Outer gradients through the sparse path match the dense path."""
    obj, init = build_pgo(n_poses=5, batch=1, seed=2)
    grads = {}
    for lin in ("dense", "sparse"):
        opt = tt.GaussNewton(obj, max_iterations=6, linearization=lin)
        layer = tt.TheseusLayer(opt)
        co = obj.compile()
        values = obj.default_values(init)
        state0 = co.pack(values, 1)

        def f(theta):
            aux = co.build_aux(values, 1)
            aux = jax.tree_util.tree_map(lambda a: a * theta, aux)
            carry = layer.solve_state(state0, aux, mode, opt.opts, 2)
            return jnp.sum(carry["state"]["SE3"][1] ** 2)

        grads[lin] = jax.grad(f)(jnp.asarray(1.1, jnp.float64))
    np.testing.assert_allclose(grads["dense"], grads["sparse"], rtol=1e-5, atol=1e-7)
