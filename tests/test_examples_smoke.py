"""Smoke tests: every example script runs end to end (subprocess, CPU).

Mirrors the reference's example-shrinking strategy
(tests/theseus_tests/test_pgo_benchmark.py:33-61, which overrides hydra
configs to tiny sizes): configurable scripts get small CLI args; the rest are
already sized to finish in tens of seconds on CPU. Everything except the two
fastest scripts is marked slow so the default `-m "not slow"` tier stays
quick."""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

FAST = [
    ("simple_example.py", []),
]
SLOW = [
    ("lie_api.py", []),
    ("backward_modes.py", []),
    ("homography_estimation.py", []),
    ("inverse_kinematics.py", []),
    ("motion_planning_2d.py", []),
    ("se2_planning.py", []),
    ("state_estimation_2d.py", ["--epochs", "3"]),
    ("bundle_adjustment.py", ["--cameras", "4", "--points", "16"]),
    ("pose_graph_benchmark.py", ["--n-poses", "32", "--iters", "3"]),
    ("pose_graph_synthetic.py", ["--n-poses", "16", "--batch", "2",
                                 "--epochs", "2"]),
    ("pose_graph_cube.py", ["--n-per-edge", "2"]),
    ("se2_inverse.py", ["--iters", "50"]),
    ("tactile_pose_estimation.py", ["--time-steps", "4", "--outer-steps", "1"]),
    ("homography_learned.py", ["--steps", "2", "--batch", "2",
                               "--patch-stride", "12", "--channels", "2"]),
    ("motion_planning_learned.py", ["--steps", "2", "--batch", "2"]),
    ("gbp_pose_graph.py", ["--n-poses", "6", "--msg-iters", "25",
                           "--max-iterations", "8"]),
]


def _run(script, args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # share the suite's persistent XLA compile cache (examples are
    # compile-bound; warm re-runs take seconds)
    env["JAX_COMPILATION_CACHE_DIR"] = str(ROOT / ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.3"
    out = subprocess.run(
        [sys.executable, str(ROOT / "examples" / script), *args],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stderr[-3000:]}"


@pytest.mark.parametrize("script,args", FAST, ids=[s for s, _ in FAST])
def test_example_fast(script, args):
    _run(script, args)


@pytest.mark.slow
@pytest.mark.parametrize("script,args", SLOW, ids=[s for s, _ in SLOW])
def test_example_slow(script, args):
    _run(script, args)
