"""Tour of the functional Lie layer and the LieArray wrapper (reference
examples/torchlie_api.py): functional ops, analytic jacobians, the typed
array API, and composition with jit/vmap/grad."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from theseus_tpu import lie
from theseus_tpu.lie import LieArray


def main():
    key = jax.random.PRNGKey(0)

    # --- functional namespace (like torchlie.functional) -----------------
    g = lie.SE3.rand(key, 4)                 # (4, 3, 4)
    w = lie.SE3.log(g)                       # (4, 6) tangent
    print("log shape:", w.shape)
    (jac,), back = lie.SE3.jexp(w)           # analytic jacobian + value
    print("jexp jac:", jac.shape, "consistency:",
          float(jnp.abs(back - g).max()))

    # ops compose with vmap/jacrev for free
    jac_auto = jax.vmap(jax.jacrev(lambda x: lie.SE3.log(lie.SE3.exp(x))))(w)
    print("vmap(jacrev(log∘exp)) == I:",
          bool(jnp.allclose(jac_auto, jnp.eye(6), atol=1e-5)))

    # --- typed wrapper (like torchlie.LieTensor) --------------------------
    a = LieArray.rand(lie.SO3, key, 8)
    b = LieArray.rand(lie.SO3, jax.random.PRNGKey(1), 8)
    c = a @ b                                # compose (closed op)
    print("between:", a.between(b).shape, "log:", c.log().shape)
    try:
        a + b
    except TypeError as e:
        print("addition blocked:", str(e)[:60], "...")

    delta = 0.1 * jax.random.normal(key, (8, 3))
    print("retract/local roundtrip:",
          float(jnp.abs(a.retract(delta).local(a) + delta).max()))

    # under jit, the wrapper is a pytree (data leaf + static ltype)
    @jax.jit
    def normalize_chain(x: LieArray):
        return x.inv().compose(x.compose(x)).log()

    print("jit over LieArray:", normalize_chain(a).shape)


if __name__ == "__main__":
    main()
