"""User-facing VariableOrdering (reference optimizer/variable_ordering.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu.optim.ordering import VariableOrdering, resolve_ordering
from theseus_tpu.sparse.cholesky import NumericSchedule, sparse_block_solve
from theseus_tpu.sparse.structure import symbolic_factor

from test_sparse import blocks_from_dense, random_block_system


def test_explicit_permutation_matches_dense():
    n, d, bsz = 8, 3, 2
    pairs, H, b = random_block_system(n, d, bsz, seed=11)
    perm = np.arange(n)[::-1].copy()
    sym = symbolic_factor(n, pairs, d, ordering=perm)
    assert np.array_equal(np.asarray(sym.perm), perm)

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
    x_dense = np.linalg.solve(H, b[..., None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(x).transpose(1, 0, 2).reshape(bsz, -1), x_dense,
        rtol=1e-8, atol=1e-8,
    )


def test_variable_ordering_api():
    x = tt.Vector(tensor=jnp.zeros((1, 2)), name="x")
    y = tt.Vector(tensor=jnp.zeros((1, 2)), name="y")
    t = tt.Vector(tensor=jnp.ones((1, 2)), name="t")
    w = tt.ScaleCostWeight(1.0)
    obj = tt.Objective()
    obj.add(tt.Local(x, t, w, name="cx"))
    obj.add(tt.Local(y, t, w, name="cy"))
    obj.add(tt.Between(x, y, tt.Vector(tensor=jnp.ones((1, 2)), name="m"), w,
                       name="cxy"))

    vo = VariableOrdering(obj)
    assert vo.names() == ["x", "y"]
    assert vo.complete
    assert vo.index_of("y") == 1
    with pytest.raises(ValueError):
        vo.append("x")  # duplicate
    with pytest.raises(ValueError):
        vo.append("nope")  # not in objective

    custom = VariableOrdering(obj, default_order=False)
    custom.extend(["y", "x"])
    perm = custom.as_permutation(["x", "y"])
    assert perm.tolist() == [1, 0]

    # solver accepts the ordering object and reaches the same solution
    opt = tt.LevenbergMarquardt(obj, max_iterations=10,
                                linearization="sparse", ordering=custom)
    sol, info = tt.TheseusLayer(opt).forward()
    opt2 = tt.LevenbergMarquardt(obj, max_iterations=10,
                                 linearization="sparse", ordering="nd")
    sol2, _ = tt.TheseusLayer(opt2).forward()
    for k in sol:
        np.testing.assert_allclose(np.asarray(sol[k]), np.asarray(sol2[k]),
                                   rtol=1e-8, atol=1e-8)


def test_resolve_ordering_specs():
    assert resolve_ordering("amd", ["a", "b"]) == "amd"
    assert resolve_ordering(["b", "a"], ["a", "b"]).tolist() == [1, 0]
    with pytest.raises(ValueError):
        resolve_ordering(["b"], ["a", "b"])
