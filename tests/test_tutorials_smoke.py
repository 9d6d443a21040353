"""Smoke-run every tutorial script (each asserts its own outcome)."""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
TUTORIALS = sorted(
    p.name for p in (ROOT / "docs" / "tutorials").glob("0*.py")
)


@pytest.mark.parametrize("script", TUTORIALS)
def test_tutorial(script):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = str(ROOT / ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.3"
    out = subprocess.run(
        [sys.executable, str(ROOT / "docs" / "tutorials" / script)],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert out.returncode == 0, (
        f"{script} failed:\nstdout:\n{out.stdout[-2000:]}\n"
        f"stderr:\n{out.stderr[-2000:]}"
    )
    assert "OK" in out.stdout
