#!/bin/bash
# Sequential reference-theseus measurement suite (VERDICT r4 item #1).
# One shape at a time on the single CPU core; results append to
# /tmp/ref_results.jsonl (then curated into evaluations/results_reference.md).
set -x
export PYTHONPATH=/root/reference:/root/reference/torchlie:/root/reference/torchkin
export JAX_PLATFORMS=cpu
cd /root/repo

R=/tmp/ref_results.jsonl
B="python scripts/bench_reference.py --json $R"

timeout 1200 $B --npz /tmp/pgo_64x16.npz   --solver scipy_sparse
timeout 2400 $B --npz /tmp/pgo_256x128.npz --solver scipy_sparse
timeout 3600 $B --npz /tmp/pgo_256x128.npz --solver dense --iters-base 1 --iters 3 --reps 1
timeout 2400 $B --npz /tmp/pgo_512x32.npz  --solver scipy_sparse
timeout 2400 $B --npz /tmp/pgo_512x32.npz  --solver dense --iters-base 1 --iters 3 --reps 1
timeout 3600 $B --npz /tmp/pgo_2048x8.npz  --solver scipy_sparse --iters-base 1 --iters 5
timeout 3600 $B --npz /tmp/pgo_2500x1.npz  --solver scipy_sparse
timeout 5400 $B --npz /tmp/pgo_4096x8.npz  --solver scipy_sparse --iters-base 1 --iters 4 --reps 2
timeout 2400 $B --npz /tmp/ba_16x200.npz   --solver scipy_sparse
timeout 5400 $B --npz /tmp/ba_64x800.npz   --solver scipy_sparse --iters-base 1 --iters 5 --reps 2
echo SUITE_DONE
