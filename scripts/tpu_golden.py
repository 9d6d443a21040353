"""On-TPU golden check: the f32 end-to-end numerical contract, executed on
the real TPU chip (not CPU).

Runs the same learned-loss-radius PGO pipeline as tests/test_pgo_golden.py
(implicit-mode gradients, 3 outer epochs, dense + sparse backends) on
whatever backend jax selects (the axon env pins the remote TPU) and asserts
the losses against the pinned f32 golden values. This is the contract that
catches TPU-only numerics regressions (e.g. the round-1 bf16-matmul bug,
where the loss collapsed by orders of magnitude): the CPU test tier cannot
see those.

Usage (TPU env):   python scripts/tpu_golden.py
Prints one JSON line {"tpu_golden": "ok"|"FAIL", "max_dev": ..., ...} and
exits nonzero on failure. bench.py --check and the round artifacts consume
this.
"""

import importlib.util
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def _load_golden_module():
    spec = importlib.util.spec_from_file_location(
        "pgo_golden", ROOT / "tests" / "test_pgo_golden.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# TPU-measured per-backend pins (v5e, f32, 2026-08-17, post assembly-kernel
# accumulator change). These are HARDWARE trajectory pins, distinct from the
# CPU pins in tests/test_pgo_golden.py: the outer learned-radius loop
# amplifies f32 summation-order differences into 3rd-digit loss shifts, so
# any deliberate numerical-contract change (kernel accumulation order,
# elimination ordering, matmul precision) requires re-measuring these on the
# chip — run with --pin to print the current values for pasting. The
# tripwire target is the bf16-matmul bug class, where the loss collapses by
# orders of magnitude, not 1e-5 drift; tolerance is 3e-6 against the pinned
# trajectory.
TPU_GOLDEN = {
    "dense": [0.004103524144738913, 0.004103155806660652,
              0.0041025192476809025],
    "sparse": [0.004104131832718849, 0.004105338826775551,
               0.004103283863514662],
}
ATOL = 3e-6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    mod = _load_golden_module()
    platform = jax.devices()[0].platform
    tol = ATOL
    pin_mode = "--pin" in sys.argv

    results = {}
    max_dev = 0.0
    ok = True
    for lin in ("dense", "sparse"):
        losses = np.asarray(mod.run(lin, dtype=jnp.float32))
        dev = float(np.max(np.abs(losses - np.asarray(TPU_GOLDEN[lin]))))
        max_dev = max(max_dev, dev)
        results[lin] = {"losses": [float(x) for x in losses], "dev": dev}
        if dev > tol:
            ok = False
    if pin_mode:
        print(json.dumps({k: v["losses"] for k, v in results.items()}))
        return

    out = {
        "tpu_golden": "ok" if ok else "FAIL",
        "platform": platform,
        "max_dev": max_dev,
        "tol": tol,
        "per_backend": results,
    }
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
