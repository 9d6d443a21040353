"""First-order manifold optimization of an SE2 inverse problem (reference
examples/se2_inverse.py): solve min_x1 || local(x1^-1, x2) ||^2 with a plain
gradient optimizer whose updates are retraction-based — the TPU-native analog
of LieGroupTensor + set_lie_tangent_enabled (the `lie_optimizer` optax
wrapper / `manifold_update`)."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.lie import SE2, se2
from theseus_tpu.optim.manifold_optax import lie_optimizer, manifold_update

try:
    import optax
except ImportError:
    optax = None


def loss_fn(params, x2):
    err = SE2.local(se2.inverse(params["x1"]), x2)
    return jnp.sum(err**2)


def run(num_iters=1000, use_lie_tangent=True, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x1 = SE2.randn(k1, 1, dtype=jnp.float64)
    x2 = SE2.randn(k2, 1, dtype=jnp.float64)
    params = {"x1": x1}

    if optax is not None and use_lie_tangent:
        tx = lie_optimizer({"x1": SE2}, optax.adam(2e-1))
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            val, grads = jax.value_and_grad(loss_fn)(params, x2)
            updates, state = tx.update(grads, state, params)
            return tx.apply(params, updates), state, val

        for i in range(num_iters):
            params, state, val = step(params, state)
            if i % 100 == 0:
                cs = params["x1"][0, 2:]
                print(f"iter {i:04d}: loss {float(val):.10f}  "
                      f"cos^2+sin^2 {float(jnp.sum(cs**2)):.10f}")
    else:
        # bare manifold SGD (no optax dependency)
        @jax.jit
        def step(params):
            val, grads = jax.value_and_grad(loss_fn)(params, x2)
            x1n = manifold_update(SE2, params["x1"], grads["x1"], 0.2)
            return {"x1": x1n}, val

        for i in range(num_iters):
            params, val = step(params)
            if i % 100 == 0:
                print(f"iter {i:04d}: loss {float(val):.10f}")

    final = float(loss_fn(params, x2))
    cs = params["x1"][0, 2:]
    unit = float(jnp.sum(cs**2))
    print(f"final: loss {final:.10f}  cos^2+sin^2 {unit:.10f}")
    # the retraction-based update keeps the rotation on the manifold exactly
    assert abs(unit - 1.0) < 1e-5, "rotation left the SE2 manifold"
    return final


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--euclidean", action="store_true",
                   help="ablation: plain Euclidean Adam (drifts off-manifold)")
    import _config
    a = _config.parse_with_config(p)
    run(num_iters=a.iters, use_lie_tangent=not a.euclidean)


if __name__ == "__main__":
    main()
