"""Native (C++) symbolic analysis vs the pure-Python reference: orderings,
fill patterns, and elimination trees must agree exactly."""

import numpy as np
import pytest

import theseus_tpu.native as tn
import theseus_tpu.sparse.structure as st


def random_graph(n, extra, seed):
    rng = np.random.RandomState(seed)
    pairs = {(i, i + 1) for i in range(n - 1)}
    for _ in range(extra):
        a, b = rng.randint(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return pairs


@pytest.mark.parametrize("mode", ["natural", "amd", "nd"])
@pytest.mark.parametrize("n,extra,seed", [(40, 25, 0), (80, 10, 1), (17, 40, 2)])
def test_native_matches_python(mode, n, extra, seed):
    # compare RAW fill: the dense-tail amalgamation (structure.py) adds
    # structural fill on top of it in both paths, so disable it here
    from theseus_tpu import config as cfg

    pairs = random_graph(n, extra, seed)
    nat = tn.native_symbolic(n, pairs, mode)
    if nat is None:
        pytest.skip("native backend unavailable")
    perm_n, cols_n, etree_n, lof_n = nat

    orig = tn.native_symbolic
    tn.native_symbolic = lambda *a, **k: None
    old_tail = cfg.SPARSE_DENSE_TAIL
    cfg.set_sparse_dense_tail(False)
    try:
        sym = st.symbolic_factor(n, pairs, 3, ordering=mode)
    finally:
        tn.native_symbolic = orig
        cfg.set_sparse_dense_tail(old_tail)

    np.testing.assert_array_equal(perm_n, sym.perm)
    for j in range(n):
        np.testing.assert_array_equal(np.sort(cols_n[j]), np.sort(sym.col_rows[j]))
    np.testing.assert_array_equal(etree_n, sym.etree_parent)
