"""Sparse-matrix utilities: batched CSR matvecs and random test problems.

Re-design of theseus/utils/sparse_matrix_utils.py (:35 mat_vec, :79 tmat_vec,
:143/:166 autograd-wrapped sparse_mv/sparse_mtv, :193 random_sparse_binary_
matrix, :253 split_into_param_sizes) and of the extlib CUDA kernels they
dispatch to (extlib/mat_mult.cu:135,217). On TPU the CSR structure is static,
so matvecs become gather + segment-sum with precomputed indices — fully
differentiable without custom autograd wrappers."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mat_vec(num_cols: int, row_ptr, col_ind, val, v):
    """Batched CSR A @ v: val (B, nnz), v (B, n) -> (B, m)."""
    row_ptr = np.asarray(row_ptr)
    col_ind = np.asarray(col_ind)
    m = len(row_ptr) - 1
    row_of = np.repeat(np.arange(m), np.diff(row_ptr))
    prod = val * v[:, col_ind]  # (B, nnz)
    return jax.vmap(lambda p: jax.ops.segment_sum(p, row_of, num_segments=m))(prod)


def tmat_vec(num_cols: int, row_ptr, col_ind, val, v):
    """Batched CSR A^T @ v: val (B, nnz), v (B, m) -> (B, n)."""
    row_ptr = np.asarray(row_ptr)
    col_ind = np.asarray(col_ind)
    m = len(row_ptr) - 1
    row_of = np.repeat(np.arange(m), np.diff(row_ptr))
    prod = val * v[:, row_of]
    return jax.vmap(
        lambda p: jax.ops.segment_sum(p, col_ind, num_segments=num_cols)
    )(prod)


# differentiable aliases (the reference wraps these in autograd Functions,
# sparse_matrix_utils.py:143,166; JAX differentiates the segment ops directly)
sparse_mv = mat_vec
sparse_mtv = tmat_vec


def random_sparse_binary_matrix(
    rows: int, cols: int, fill: float, min_entries_per_col: int, rng=None
) -> "scipy.sparse.csr_matrix":
    """Random sparse binary CSR (reference sparse_matrix_utils.py:193)."""
    import scipy.sparse as sp

    rng = rng or np.random.RandomState(0)
    retv = sp.lil_matrix((rows, cols))
    if min_entries_per_col > 0:
        for c in range(cols):
            r = rng.choice(rows, size=min(min_entries_per_col, rows), replace=False)
            retv[r, c] = 1.0
    n_extra = int(fill * rows * cols)
    retv[rng.randint(0, rows, n_extra), rng.randint(0, cols, n_extra)] = 1.0
    return retv.tocsr()


def split_into_param_sizes(
    n: int, param_size_range_min: int, param_size_range_max: int, rng=None
) -> np.ndarray:
    """Split n columns into random variable-block sizes (reference :253)."""
    rng = rng or np.random.RandomState(0)
    sizes = []
    left = n
    while left > 0:
        s = int(rng.randint(param_size_range_min, param_size_range_max + 1))
        s = min(s, left)
        sizes.append(s)
        left -= s
    return np.asarray(sizes)
