"""Parity of the whole-sweep Pallas kernels (sparse/pallas_whole.py) against
the pure-JAX factorization/substitution paths, in Mosaic interpret mode.

The same comparison runs compiled on hardware via
scripts/tpu_pallas_parity.py (recorded in BENCH_SWEEP.md each round)."""

import jax.numpy as jnp
import numpy as np
import pytest

from theseus_tpu.optim.normal import SparseNormalBuilder
from theseus_tpu.sparse.assemble import apply_block_damping, assemble
from theseus_tpu.sparse.cholesky import factorize, solve_with_factor
from theseus_tpu.sparse.pallas_factorize import soa_to_aos
from theseus_tpu.sparse import pallas_whole as pw
from theseus_tpu.utils.examples.pose_graph import (
    build_pgo_objective,
    synthetic_pose_graph,
)


def _system(n_poses, bsz, ordering="auto"):
    gt, edges, meas, init = synthetic_pose_graph(n_poses, batch=bsz)
    obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0])
    co = obj.compile()
    bld = SparseNormalBuilder(co, ordering=ordering)
    values = obj.default_values(
        {f"pose_{i}": init[i] for i in range(n_poses)}
    )
    state = co.pack(values, bsz)
    aux = co.build_aux(values, bsz)
    blocks = co.linearize_blocks(state, aux)
    ata, atb = assemble(bld.pattern, co, blocks)
    ata = apply_block_damping(bld.pattern, ata, 1e-3, True, bld.damping_eps)
    return bld, ata, atb


@pytest.mark.slow
@pytest.mark.parametrize("n_poses,bsz", [(16, 4), (48, 8)])
def test_whole_kernels_match_jax(n_poses, bsz):
    bld, ata, atb = _system(n_poses, bsz)
    sched = bld.sched
    assert sched.tail_k == 0

    lref = factorize(sched, ata)
    xref = solve_with_factor(sched, lref, atb)

    lsoa = pw.factorize_whole(sched, ata, interpret=True)
    nnz1 = sched.sym.nnz_l + 1
    d = bld.pattern.d
    laos = soa_to_aos(lsoa[:nnz1, : d * d, :bsz], d)
    np.testing.assert_allclose(
        np.asarray(laos), np.asarray(lref), atol=1e-5
    )
    # sentinel slot and overhang pad must be zero (masked-gather contract)
    assert float(jnp.abs(lsoa[0]).max()) == 0.0
    assert float(jnp.abs(lsoa[nnz1:]).max()) == 0.0

    x = pw.solve_whole(sched, lsoa, atb, interpret=True)
    scale = float(jnp.abs(xref).max())
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xref), atol=2e-5 * max(scale, 1.0)
    )


@pytest.mark.slow
def test_whole_kernels_amd_ordering():
    """The whole kernels are order-agnostic (no level schedule needed):
    verify on the deep AMD etree as well."""
    bld, ata, atb = _system(32, 4, ordering="amd")
    sched = bld.sched
    if sched.tail_k:
        pytest.skip("amalgamated tail not covered by whole kernels")
    lref = factorize(sched, ata)
    xref = solve_with_factor(sched, lref, atb)
    lsoa = pw.factorize_whole(sched, ata, interpret=True)
    x = pw.solve_whole(sched, lsoa, atb, interpret=True)
    scale = float(jnp.abs(xref).max())
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xref), atol=2e-5 * max(scale, 1.0)
    )
