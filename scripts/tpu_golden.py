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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    mod = _load_golden_module()
    platform = jax.devices()[0].platform
    golden = np.asarray(mod.GOLDEN_LOSSES_F32)
    tol = mod.ATOL_F32

    results = {}
    max_dev = 0.0
    ok = True
    for lin in ("dense", "sparse"):
        losses = np.asarray(mod.run(lin, dtype=jnp.float32))
        dev = float(np.max(np.abs(losses - golden)))
        max_dev = max(max_dev, dev)
        results[lin] = {"losses": [float(x) for x in losses], "dev": dev}
        if dev > tol:
            ok = False

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
