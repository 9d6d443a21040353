"""Local-cost backward micro-benchmark — port of the reference's
evaluations/time_local_cost_backward.py:14 (LM, 3 iterations, a single
`Local(a, b)` cost on SO3/SE3, forward-only vs forward+backward, batch
sweep). The tiniest possible solve = a pure dispatch/latency probe: at these
shapes arithmetic is ~0, so the number IS the per-solve overhead floor.

    python evaluations/time_local_cost_backward.py [--batches 1 32 256 2048]

Writes evaluations/results_local_cost_backward.md.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu.utils import fresh_eps

OUT = pathlib.Path(__file__).resolve().parent / "results_local_cost_backward.md"


def build(group, batch, dtype):
    import theseus_tpu as tt
    from theseus_tpu.lie import se3, so3

    mod = {"SO3": so3, "SE3": se3}[group]
    ctor = {"SO3": tt.SO3, "SE3": tt.SE3}[group]
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    dof = {"SO3": 3, "SE3": 6}[group]
    a0 = mod.exp(jax.random.normal(k1, (batch, dof), dtype))
    b0 = mod.exp(jax.random.normal(k2, (batch, dof), dtype))

    obj = tt.Objective(dtype=dtype)
    a = ctor(name="a")
    obj.add(tt.Local(a, tt.Variable(b0, name="b"), tt.ScaleCostWeight(jnp.asarray(1.0, dtype)), name="d"))
    opt = tt.LevenbergMarquardt(obj, max_iterations=3, step_size=0.1,
                                adaptive_damping=False, damping=0.1)
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values({"a": a0})
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)
    return layer, co, state, aux, a0


def run_case(group, batch, backward, dtype=jnp.float32, reps=5, steps=10):
    """Per-step ms of a 10-step loop: forward LM solve (+ optionally an
    outer-gradient step on the input tensor through unroll backward, the
    reference's Adam-on-Parameter loop)."""
    layer, co, state, aux, a0 = build(group, batch, dtype)
    opts = layer.optimizer.opts
    tk = group  # packed state is keyed by variable type ("SO3"/"SE3")

    if backward:
        def loss(a_in, eps):
            st = dict(state)
            st[tk] = a_in * (1.0 + eps)
            carry = layer.solve_state(st, aux, "unroll", opts)
            return jnp.sum(carry["err"]), carry["err"]

        @jax.jit
        def step(a_in, eps):
            (l, err), g = jax.value_and_grad(loss, has_aux=True)(a_in, eps)
            return a_in - 0.01 * g, l

        def one(eps):
            a_in = state[tk]
            for _ in range(steps):
                a_in, l = step(a_in, eps)
            return np.asarray(l)
    else:
        @jax.jit
        def fwd(a_in, eps):
            st = dict(state)
            st[tk] = a_in * (1.0 + eps)
            carry = layer.solve_state(st, aux, "unroll", opts)
            return carry["err"]

        def one(eps):
            # vary eps per step: bit-identical repeated dispatches are the
            # exact pattern the remote executor's cross-process result cache
            # serves for free (utils.fresh_eps rationale), which would
            # under-measure this arm relative to the fwd+bwd arm whose
            # inputs evolve every step
            for i in range(steps):
                e = fwd(state[tk], eps + jnp.asarray(i * 1e-12, dtype))
            return np.asarray(e)

    z = jnp.asarray(0, dtype)
    one(z)  # compile
    ts = []
    for i in range(reps):
        eps = jnp.asarray(fresh_eps(i), dtype)
        t0 = time.perf_counter()
        one(eps)
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 32, 256, 2048])
    p.add_argument("--groups", nargs="+", default=["SO3", "SE3"])
    args = p.parse_args(argv)
    platform = jax.devices()[0].platform

    rows = []
    for group in args.groups:
        for batch in args.batches:
            f = run_case(group, batch, backward=False)
            b = run_case(group, batch, backward=True)
            rows.append((group, batch, f, b))
            print(f"{group} b={batch:5d}: fwd {f:8.3f} ms  fwd+bwd {b:8.3f} ms",
                  flush=True)

    with open(OUT, "w") as fh:
        fh.write("# Local-cost backward micro-benchmark\n\n")
        fh.write(f"Platform: {platform}. LM 3 iters on one `Local(a, b)` cost\n")
        fh.write("(reference evaluations/time_local_cost_backward.py). Per-step ms\n")
        fh.write("of a 10-step loop; fwd+bwd adds an outer gradient step on the\n")
        fh.write("input through unroll backward. At these shapes the time IS the\n")
        fh.write("dispatch overhead (arithmetic is microseconds).\n\n")
        fh.write("| group | batch | forward ms/step | fwd+bwd ms/step |\n")
        fh.write("|---|---|---|---|\n")
        for g, b, f, bb in rows:
            fh.write(f"| {g} | {b} | {f:.3f} | {bb:.3f} |\n")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
