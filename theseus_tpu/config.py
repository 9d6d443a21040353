"""Global numeric configuration for theseus_tpu.

Per-dtype epsilon tables controlling Taylor-branch switching in Lie-group ops,
mirroring the behavior of the reference's per-dtype registries
(reference: theseus/global_params.py:24, torchlie/torchlie/global_params.py:20)
but redesigned as a plain immutable-by-convention dict keyed by canonical dtype
name, safe to read at trace time (values are Python floats, never traced).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np


def _dt(dtype) -> str:
    return np.dtype(dtype).name


# Branch-switch thresholds. Values follow the reference tables
# (torchlie/torchlie/global_params.py:36-63): near-zero theta thresholds for
# exp/log Taylor branches, wider thresholds for derivative branches, and
# near-pi thresholds for the SO3 log antipodal branch.
_DEFAULTS: Dict[str, float] = {
    # SO3/SE3 exp near-zero (theta small)
    "so3_near_zero_eps_float32": 1e-2,
    "so3_near_zero_eps_float64": 5e-3,
    # SO3/SE3 log near-pi (1 + cos(theta) small)
    "so3_near_pi_eps_float32": 1e-2,
    "so3_near_pi_eps_float64": 1e-7,
    # wider derivative branch eps (jlog coefficients)
    "so3_d_near_zero_eps_float32": 2e-1,
    "so3_d_near_zero_eps_float64": 1e-2,
    # SO3 matrix orthonormality check tolerance
    "so3_matrix_eps_float32": 4e-4,
    "so3_matrix_eps_float64": 1e-6,
    "so3_quat_eps_float32": 2e-4,
    "so3_quat_eps_float64": 5e-7,
    "so3_hat_eps_float32": 5e-6,
    "so3_hat_eps_float64": 5e-7,
    "se3_hat_eps_float32": 5e-6,
    "se3_hat_eps_float64": 5e-7,
    # SO2/SE2 near-zero
    "se2_near_zero_eps_float32": 3e-2,
    "se2_near_zero_eps_float64": 1e-6,
    "se2_d_near_zero_eps_float32": 1e-1,
    "se2_d_near_zero_eps_float64": 1e-3,
}


@dataclasses.dataclass
class GlobalParams:
    """Mutable global parameter registry (set once at program start)."""

    _values: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(_DEFAULTS)
    )

    def get(self, key: str, dtype) -> float:
        return self._values[f"{key}_{_dt(dtype)}"]

    def set(self, **kwargs: float) -> None:
        for k, v in kwargs.items():
            if k not in self._values:
                raise ValueError(f"Unknown global param {k}")
            self._values[k] = v


GLOBAL_PARAMS = GlobalParams()


def set_global_params(**kwargs: float) -> None:
    """Public setter (reference: theseus/global_params.py:66)."""
    GLOBAL_PARAMS.set(**kwargs)


def get_eps(namespace: str, name: str, dtype) -> float:
    """Fetch eps e.g. get_eps("so3", "near_zero", x.dtype)."""
    return GLOBAL_PARAMS.get(f"{namespace}_{name}_eps", dtype)


def default_float() -> jnp.dtype:
    return jnp.zeros(0).dtype


# ---------------------------------------------------------------------------
# Matmul precision for solver-critical paths. On TPU, f32 matmuls default to
# ONE bf16 MXU pass; second-order solvers (J^T J assembly, Cholesky updates,
# substitutions) need more accumulation or convergence collapses. "high"
# (3-pass bf16, ~f32-equivalent mantissa for these small contractions) is the
# default: measured on v5e it matches "highest" iterate-for-iterate on the
# PGO/BA suites while cutting the 256x128 LM iteration from 10.1 to 9.3 ms.
# The context is applied at trace time around every solve entry point.
# ---------------------------------------------------------------------------
import contextlib

import jax

SOLVER_MATMUL_PRECISION = "high"


def set_solver_precision(precision: str) -> None:
    """'high' (3-pass bf16, default) | 'highest' (full f32) | 'default'
    (single bf16 pass — fastest, known to break LM convergence)."""
    global SOLVER_MATMUL_PRECISION
    SOLVER_MATMUL_PRECISION = precision


def solver_precision():
    """Context manager applied around solver tracing."""
    return jax.default_matmul_precision(SOLVER_MATMUL_PRECISION)


# ---------------------------------------------------------------------------
# Mixed-precision iterative refinement on the normal-equation solves
# (sparse/refine.py). The reference's precision contract is an f64 sparse
# factor/solve (optimizer/autograd/baspacho_sparse_autograd.py:41) and a
# double-precision Atb (sparse_linearization.py:169-176); on TPU we keep the
# f32 MXU factorization and recover the f64 solve plateau with REFINE_STEPS
# residual-correction sweeps (residual accumulated in f64 when the process
# has x64 enabled — the axon TPU backend supports emulated f64). 0 disables.
# ---------------------------------------------------------------------------
REFINE_STEPS = 1


def set_refine_steps(n: int) -> None:
    global REFINE_STEPS
    REFINE_STEPS = int(n)


# Accumulate the gradient Atb = -J^T r in f64 during assembly (the reference
# does this with a double sparse_mtv regardless of solver). Only active when
# the process has x64 enabled; costs one extra O(K B m d) einsum in emulated
# f64 per bucket.
ATB_HIGH_PRECISION = True


def set_atb_high_precision(enabled: bool) -> None:
    global ATB_HIGH_PRECISION
    ATB_HIGH_PRECISION = bool(enabled)


# ---------------------------------------------------------------------------
# Constant hoisting (utils/hoist.py): pass the symbolic plan's gather/index
# tables to compiled programs as runtime parameters instead of inline HLO
# literals. Literals were 74% of the sphere2500 program text and crashed the
# remote compiler at BA 256x8000; hoisting shrinks the program and the
# compile-RPC body. Disable to A/B or if a backend mis-handles parameter-fed
# gathers.
# ---------------------------------------------------------------------------
HOIST_CONSTANTS = True


def set_hoist_constants(enabled: bool) -> None:
    global HOIST_CONSTANTS
    HOIST_CONSTANTS = bool(enabled)


# ---------------------------------------------------------------------------
# Sparse-solver block padding: round the uniform block dof up to a multiple
# of this value (e.g. 8 = TPU f32 sublane count, so 6-dof SE3 blocks tile as
# 8x8 instead of a ragged 6x6). Padding dims carry identity diagonals in the
# assembled system, so solves are unaffected. 1 disables.
# ---------------------------------------------------------------------------
SPARSE_BLOCK_PAD_MULTIPLE = 1


def set_sparse_block_pad(multiple: int) -> None:
    global SPARSE_BLOCK_PAD_MULTIPLE
    SPARSE_BLOCK_PAD_MULTIPLE = int(multiple)


# ---------------------------------------------------------------------------
# Schur dense-elimination budget: when the densified camera-point coupling
# W and Hcp (each B x (C*d) x (P*d)) fit in this many bytes, the Schur
# complement S = Hcc - W Hcp^T is computed as ONE batched GEMM on the MXU
# instead of per-point gather/scatter sweeps. At 128 cams x 4000 pts x f32
# this is a (768, 32000) x (32000, 768) matmul — exactly what the hardware
# is built for. Beyond the budget, a lax.scan over point chunks is used.
# ---------------------------------------------------------------------------
SCHUR_DENSE_BUDGET_BYTES = 2 << 30


def set_schur_dense_budget(nbytes: int) -> None:
    global SCHUR_DENSE_BUDGET_BYTES
    SCHUR_DENSE_BUDGET_BYTES = int(nbytes)


# ---------------------------------------------------------------------------
# Supernodal dense-tail amalgamation for the generic sparse solver (the
# BaSpaCho supernodal idea, reference extlib/baspacho_solver.h:88, recast
# TPU-first): when the trailing columns of the elimination order are nearly
# dense (bipartite BA-like graphs make the camera sub-block fully dense;
# ND separators are cliques), they are merged into ONE dense trailing
# supernode factored by a single batched POTRF on the MXU, instead of
# per-column sweeps padded to the dense tail's huge umax/rmax.
#   SPARSE_TAIL_DENSITY: merge while trailing-pattern density >= this
#   SPARSE_TAIL_MAX_DIM: cap K*d of the dense tail
#   SPARSE_TAIL_MIN_K:   don't bother below this many columns
# ---------------------------------------------------------------------------
#   Thresholds measured on TPU v5e (BENCH_SWEEP.md): a K=9 tail on PGO
#   REPLACED fast Pallas level sweeps with dense triangular machinery and
#   regressed 64x16 from 0.29 to 0.68 ms/iter, while the K>=57 tails on
#   BA-like graphs win 14x — so small/sparse tails must not trigger.
#   (PGO trailing density: 0.58 @ k=8, 0.33 @ k=16; BA: >=0.92 throughout.)
SPARSE_DENSE_TAIL = True
SPARSE_TAIL_DENSITY = 0.6
SPARSE_TAIL_MAX_DIM = 2048
SPARSE_TAIL_MIN_K = 16


def set_sparse_dense_tail(enabled: bool) -> None:
    global SPARSE_DENSE_TAIL
    SPARSE_DENSE_TAIL = bool(enabled)


# ---------------------------------------------------------------------------
# Pallas fused-kernel gate: "auto" enables fused cost kernels on TPU backends
# for float32; True/False force. (Fused kernels use a polynomial atan2 with
# ~1e-7 f32 accuracy — bit-exactness with the pure-JAX path is not promised.)
# ---------------------------------------------------------------------------
USE_PALLAS = "auto"
_PALLAS_INTERPRET = False

# Whole-sweep factorization/substitution kernels (sparse/pallas_whole.py):
# measured SLOWER than the per-level kernels at every PGO shape on TPU v5e
# (64x16: 0.38 vs 0.30, 256x128: wash, 2048x8: 16.7 vs 11.1, 2500x1: 15.2
# vs 10.5 ms/LM-iter) — the sequential per-column grid is DMA-latency-bound
# while the per-level kernels batch a whole level per dispatch. Kept as a
# config-gated experiment; see BENCH_SWEEP.md for the A/B data.
PALLAS_WHOLE = False


def set_pallas_whole(enabled: bool) -> None:
    global PALLAS_WHOLE
    PALLAS_WHOLE = bool(enabled)


# Lane folding in the fused linearization kernels (ops/pallas_between_soa.py,
# ops/pallas_reprojection.py): at batch < 128 Mosaic pads the lane axis to
# 128, inflating every operand/output 128/b x in HBM (the BA 256x8000
# batch-1 linearization requested 19.96 GB and OOM'd the chip). Folding
# 128/b consecutive edges/observations into one lane block removes the
# padding bit-identically at the cost of two XLA transposes around the
# kernel. True = fold whenever 128 % b == 0; False = r4 padded layout.
PALLAS_LANE_FOLD = True


def set_pallas_lane_fold(enabled: bool) -> None:
    global PALLAS_LANE_FOLD
    PALLAS_LANE_FOLD = bool(enabled)


# Level-RUN scanning (sparse/cholesky.py): consecutive etree levels whose
# padded tables are shape-compatible (within LEVEL_RUN_WASTE x the exact
# gather volume) are stacked and executed by ONE lax.scan body instead of
# one unrolled HLO segment each. This makes the solver's program size
# O(#runs) ~ O(1) instead of O(#levels) — compile time is the payoff
# (sphere2500: 17 levels x 3 sweeps x ~600 unrolled-small-linalg ops
# dominated the 32k-op program; on TPU each level also costs a separate
# Mosaic kernel compile). "auto" enables runs when the level count is at
# least LEVEL_RUN_MIN_LEVELS; True/False force.
LEVEL_RUNS = "auto"
# Hardware A/B (scripts/ab_level_runs.py, TPU v5e 2026-08-18):
#   256x128 (13 levels): unrolled 2.92 ms/iter / 35.5s first call,
#                        runs     3.10 ms/iter / 39.6s  (runs lose both)
#   2500x1  (17 levels): unrolled 8.75 ms/iter / 42.2s,
#                        runs    11.26 ms/iter / 25.1s  (runs trade 29%
#                        runtime for a 40% compile win)
# Production solves are repeated (layer inside a training loop), so auto
# stays runtime-first: runs only kick in where the unrolled program would
# be minutes of compile (very deep etrees). Single-shot / compile-latency-
# critical users opt in with config.set_level_runs(True).
LEVEL_RUN_MIN_LEVELS = 24
LEVEL_RUN_WASTE = 2.5


def set_level_runs(mode) -> None:
    """mode: "auto" | True | False."""
    global LEVEL_RUNS
    LEVEL_RUNS = mode


def set_use_pallas(mode) -> None:
    """mode: "auto" | True | False."""
    global USE_PALLAS
    USE_PALLAS = mode


def pallas_enabled(dtype) -> bool:
    if USE_PALLAS is False:
        return False
    if np.dtype(dtype) != np.dtype(np.float32):
        return False
    if USE_PALLAS is True:
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
