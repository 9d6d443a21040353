"""Multi-device (8 virtual CPU devices, see conftest) sharding tests:
solution + implicit-gradient parity between sharded and unsharded solves,
and the fused-kernel path under shard_map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theseus_tpu as tt
from theseus_tpu import config as tt_config
from theseus_tpu import lie
from theseus_tpu.parallel import (
    make_mesh, shard_map_solve, shard_problem)
from theseus_tpu.utils.examples.pose_graph import (
    build_pgo_objective, pose_values, synthetic_pose_graph)

N_POSES, BATCH = 8, 8
DTYPE = jnp.float32


def _problem(linearization="dense", max_iterations=5, dtype=DTYPE):
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=N_POSES, batch=BATCH, seed=3, dtype=dtype
    )
    obj, _ = build_pgo_objective(N_POSES, edges, meas, gt[0], dtype=dtype)
    opt = tt.LevenbergMarquardt(
        obj, max_iterations=max_iterations, adaptive_damping=True,
        linearization=linearization,
    )
    layer = tt.TheseusLayer(opt)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, BATCH)
    aux = co.build_aux(values, BATCH)
    return layer, co, state, aux, gt


def test_make_mesh_eight_devices():
    mesh = make_mesh(8)
    assert len(mesh.devices.flat) == 8


@pytest.mark.parametrize("linearization", ["dense", "sparse"])
def test_sharded_solution_parity(linearization):
    """jit(solve) on batch-sharded inputs == single-device solve."""
    layer, co, state, aux, _ = _problem(linearization)
    opts = layer.optimizer.opts

    @jax.jit
    def solve(state, aux):
        return layer.solve_state(state, aux, "implicit", opts)

    ref = solve(state, aux)
    mesh = make_mesh(8)
    sh_state, sh_aux = shard_problem(co, state, aux, mesh)
    with mesh:
        out = solve(sh_state, sh_aux)
    np.testing.assert_allclose(
        np.asarray(out["state"]["SE3"]), np.asarray(ref["state"]["SE3"]),
        atol=1e-4,  # f32: reduction order differs across shardings
    )
    np.testing.assert_allclose(
        np.asarray(out["err"]), np.asarray(ref["err"]), rtol=1e-3, atol=1e-6
    )
    # the solution actually lives sharded across all 8 devices
    assert len(out["state"]["SE3"].sharding.device_set) == 8


def test_sharded_implicit_grad_parity():
    """Outer gradient (implicit mode) wrt a measurement aux input matches
    between sharded and unsharded runs."""
    # f64: sharding must be *exactly* the same math (f32 reduction-order
    # noise through the implicit linear solve reaches ~1e-3 and would mask
    # a real bug; measured f64 agreement is ~3e-11)
    layer, co, state, aux, gt = _problem("dense", dtype=jnp.float64)
    opts = layer.optimizer.opts
    target = jax.lax.stop_gradient(state["SE3"])

    def loss(state, aux):
        carry = layer.solve_state(state, aux, "implicit", opts)
        d = jax.vmap(jax.vmap(lie.SE3.local))(carry["state"]["SE3"], target)
        return jnp.mean(jnp.sum(d * d, axis=-1))

    g = jax.jit(jax.grad(loss, argnums=1))

    ref = g(state, aux)
    mesh = make_mesh(8)
    sh_state, sh_aux = shard_problem(co, state, aux, mesh)
    with mesh:
        out = g(sh_state, sh_aux)
    ref_flat = jax.tree_util.tree_leaves(ref)
    out_flat = jax.tree_util.tree_leaves(out)
    assert any(float(jnp.abs(l).max()) > 1e-8 for l in ref_flat), "dead grads"
    for r, o in zip(ref_flat, out_flat):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-9)


@pytest.mark.parametrize("linearization", ["dense", "sparse"])
def test_shard_map_solve_parity(linearization):
    """shard_map-wrapped solve (the fused-kernel plumbing) == plain solve."""
    layer, co, state, aux, _ = _problem(linearization)
    opts = layer.optimizer.opts

    @jax.jit
    def ref_solve(state, aux):
        return layer.solve_state(state, aux, "implicit", opts)

    ref = ref_solve(state, aux)
    mesh = make_mesh(8)
    sh_state, sh_aux = shard_problem(co, state, aux, mesh)
    solve = jax.jit(shard_map_solve(layer, mesh, "implicit", opts))
    out = solve(sh_state, sh_aux)
    np.testing.assert_allclose(
        np.asarray(out["state"]["SE3"]), np.asarray(ref["state"]["SE3"]),
        atol=1e-4,
    )


def test_shard_map_fused_kernel_parity():
    """The Pallas fused Between path (interpret mode on CPU) under shard_map
    over the 8-device mesh matches the unsharded vmap path. This is the
    multi-chip story for the fused kernels: inside shard_map each device runs
    the Mosaic kernel on its local batch shard."""
    layer, co, state, aux, _ = _problem("sparse")
    opts = layer.optimizer.opts

    @jax.jit
    def ref_solve(state, aux):
        return layer.solve_state(state, aux, "implicit", opts)

    ref = ref_solve(state, aux)  # vmap path (pallas off by default on cpu)

    mesh = make_mesh(8)
    sh_state, sh_aux = shard_problem(co, state, aux, mesh)
    tt_config.USE_PALLAS = True
    tt_config._PALLAS_INTERPRET = True
    try:
        solve = jax.jit(shard_map_solve(layer, mesh, "implicit", opts))
        out = solve(sh_state, sh_aux)
        np.testing.assert_allclose(
            np.asarray(out["state"]["SE3"]), np.asarray(ref["state"]["SE3"]),
            atol=1e-3,  # fused kernel uses polynomial atan2 (~1e-6/op)
        )
        assert len(out["state"]["SE3"].sharding.device_set) == 8
    finally:
        tt_config.USE_PALLAS = "auto"
        tt_config._PALLAS_INTERPRET = False


def test_sharded_unroll_grad_parity():
    """Unroll-mode gradients also survive sharding (plain jit, no shard_map)."""
    layer, co, state, aux, _ = _problem("dense", max_iterations=3,
                                         dtype=jnp.float64)
    opts = layer.optimizer.opts
    target = jax.lax.stop_gradient(state["SE3"])

    def loss(state, aux):
        carry = layer.solve_state(state, aux, "unroll", opts)
        d = jax.vmap(jax.vmap(lie.SE3.local))(carry["state"]["SE3"], target)
        return jnp.mean(jnp.sum(d * d, axis=-1))

    g = jax.jit(jax.grad(loss, argnums=1))
    ref = g(state, aux)
    mesh = make_mesh(8)
    sh_state, sh_aux = shard_problem(co, state, aux, mesh)
    with mesh:
        out = g(sh_state, sh_aux)
    for r, o in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-9)
