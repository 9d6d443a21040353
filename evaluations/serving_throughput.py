"""Serving throughput: full NLLS solves/sec vs batch size (VERDICT r4 #6).

THE selling point of a vmapped TPU NLLS layer for robotics serving: the
per-dispatch cost is nearly flat in batch (the r4 dispatch-floor probe,
evaluations/results_local_cost_backward.md), so batching multiplies
throughput by orders of magnitude. This harness measures it end-to-end on
complete solves (not micro local/backward ops): a 7-dof IK problem
(reference examples/inverse_kinematics.py + torchkin) and a small SE3 PGO
(tactile-episode-sized pose chain).

    python evaluations/serving_throughput.py --batches 1 32 256 2048
    python evaluations/serving_throughput.py --reference --batches 1 32

--reference runs the torch reference (CPU — the only torch device here)
on the identical IK problem for the comparison column.

Timing is cache-proof (fresh random targets per timed call — the remote
executor serves bit-identical executions from a cross-process cache) and
uses >= 8 calls per batch point to amortize the ~100 ms +-4 ms tunnel
call constant.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ARM_7DOF = """
<robot name="arm7">
  <link name="base"/> <link name="l1"/> <link name="l2"/> <link name="l3"/>
  <link name="l4"/> <link name="l5"/> <link name="l6"/> <link name="ee"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0 0 0.25"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j4" type="revolute">
    <parent link="l3"/><child link="l4"/>
    <origin xyz="0 0 0.25"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="j5" type="revolute">
    <parent link="l4"/><child link="l5"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
  </joint>
  <joint name="j6" type="revolute">
    <parent link="l5"/><child link="l6"/>
    <origin xyz="0 0 0.15"/><axis xyz="0 1 0"/>
  </joint>
  <joint name="j7" type="revolute">
    <parent link="l6"/><child link="ee"/>
    <origin xyz="0 0 0.1"/><axis xyz="1 0 0"/>
  </joint>
</robot>
"""

IK_ITERS = 12
PGO_POSES = 16
PGO_ITERS = 10


def bench_ours_ik(batches, reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import theseus_tpu as tt
    from theseus_tpu import lie
    from theseus_tpu.kin import Robot, get_forward_kinematics_fns
    from theseus_tpu.utils import fresh_eps

    robot = Robot.from_urdf_string(ARM_7DOF)
    fk, _, _ = get_forward_kinematics_fns(robot, ["ee"])
    dof = robot.dof

    rows = []
    for batch in batches:
        theta_var = tt.Vector(dof, name="theta")
        target = tt.Variable(jnp.zeros((batch, 3, 4), jnp.float32),
                             name="target")

        def ik_err(optim, aux):
            (th,) = optim
            (tgt,) = aux
            (pose,) = fk(th)
            return lie.SE3.local(tgt, pose)

        obj = tt.Objective(dtype=jnp.float32)
        obj.add(tt.AutoDiffCostFunction([theta_var], 6, ik_err,
                                        aux_vars=[target], name="ik"))
        opt = tt.LevenbergMarquardt(obj, max_iterations=IK_ITERS,
                                    adaptive_damping=True)
        layer = tt.TheseusLayer(opt)
        co = obj.compile()

        key = jax.random.PRNGKey(0)
        th_t = 0.7 * jax.random.normal(key, (batch, dof), dtype=jnp.float32)
        (tgt0,) = jax.vmap(lambda t: fk(t))(th_t)

        @jax.jit
        def solve(tgt):
            values = {"theta": jnp.zeros((batch, dof), jnp.float32),
                      "target": tgt}
            values = obj.default_values(values)
            state = co.pack(values, batch)
            aux = co.build_aux(values, batch)
            carry = layer.solve_state(state, aux, "unroll", opt.opts)
            return carry["err"]

        err = solve(tgt0)  # compile
        np.asarray(err)
        n = max(1, reps)
        t0 = time.perf_counter()
        for i in range(n):
            # fresh target per call: perturb the target translations
            tgt = tgt0.at[..., :, 3].add(jnp.asarray(fresh_eps(i), jnp.float32))
            np.asarray(solve(tgt))
        dt = (time.perf_counter() - t0) / n
        rows.append(("ik7", batch, dt * 1e3, batch / dt,
                     float(np.asarray(err).mean())))
        print(f"ik7 batch={batch}: {dt*1e3:.2f} ms/call, "
              f"{batch/dt:,.0f} solves/s, mean_err={rows[-1][4]:.2e}",
              flush=True)
    return rows


def bench_ours_pgo(batches, reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import theseus_tpu as tt
    from theseus_tpu.utils import fresh_eps
    from theseus_tpu.utils.examples.pose_graph import (
        build_pgo_objective, pose_values, synthetic_pose_graph)

    rows = []
    for batch in batches:
        gt, edges, meas, init = synthetic_pose_graph(
            n_poses=PGO_POSES, batch=batch, seed=0, dtype=jnp.float32)
        obj, _ = build_pgo_objective(PGO_POSES,
                                     [tuple(e) for e in np.asarray(edges)],
                                     meas, gt[0], dtype=jnp.float32)
        opt = tt.LevenbergMarquardt(obj, max_iterations=PGO_ITERS,
                                    adaptive_damping=True,
                                    linearization="sparse")
        layer = tt.TheseusLayer(opt)
        co = obj.compile()
        values = obj.default_values(pose_values(np.asarray(init)))
        state = co.pack(values, batch)
        aux = co.build_aux(values, batch)

        @jax.jit
        def solve(state, eps):
            st = {k: v * (1.0 + eps) for k, v in state.items()}
            carry = layer.solve_state(st, aux, "unroll", opt.opts)
            return carry["err"]

        z = jnp.asarray(0, jnp.float32)
        err = solve(state, z)
        np.asarray(err)
        n = max(1, reps)
        t0 = time.perf_counter()
        for i in range(n):
            np.asarray(solve(state, jnp.asarray(fresh_eps(i), jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        rows.append((f"pgo{PGO_POSES}", batch, dt * 1e3, batch / dt,
                     float(np.asarray(err).mean())))
        print(f"pgo{PGO_POSES} batch={batch}: {dt*1e3:.2f} ms/call, "
              f"{batch/dt:,.0f} solves/s, mean_err={rows[-1][4]:.2e}",
              flush=True)
    return rows


def bench_reference_ik(batches, reps):
    """Torch reference on the identical 7-dof IK problem (CPU)."""
    for p in ("/root/reference", "/root/reference/torchlie",
              "/root/reference/torchkin"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import tempfile

    import numpy as np
    import torch

    import theseus as th
    from torchkin import Robot, get_forward_kinematics_fns

    # the reference Robot only loads from a file path
    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(ARM_7DOF)
        urdf_path = f.name
    robot = Robot.from_urdf_file(urdf_path, dtype=torch.float32)
    fk, _, _ = get_forward_kinematics_fns(robot, ["ee"])
    dof = robot.dof

    rows = []
    for batch in batches:
        g = torch.Generator().manual_seed(0)
        th_t = 0.7 * torch.randn(batch, dof, generator=g)
        with torch.no_grad():
            (tgt0,) = fk(th_t)

        theta = th.Vector(dof, name="theta")
        target = th.Variable(tgt0.clone(), name="target")

        def ik_err(optim_vars, aux_vars):
            (theta_v,) = optim_vars
            (tgt,) = aux_vars
            (pose,) = fk(theta_v.tensor)
            return th.SE3(tensor=tgt.tensor).local(th.SE3(tensor=pose))

        cost = th.AutoDiffCostFunction([theta], ik_err, 6,
                                       aux_vars=[target], name="ik")
        obj = th.Objective()
        obj.add(cost)
        opt = th.LevenbergMarquardt(obj, max_iterations=IK_ITERS,
                                    step_size=1.0, vectorize=True)
        layer = th.TheseusLayer(opt)

        def solve(tgt):
            with torch.no_grad():
                out, info = layer.forward(
                    {"theta": torch.zeros(batch, dof), "target": tgt},
                    optimizer_kwargs={"adaptive_damping": True,
                                      "damping": 1e-3},
                )
            return info.last_err

        solve(tgt0)  # warm up
        n = max(1, reps)
        t0 = time.perf_counter()
        for i in range(n):
            tgt = tgt0 + torch.full_like(tgt0, 1e-7 * (i + 1))
            solve(tgt)
        dt = (time.perf_counter() - t0) / n
        rows.append(("ik7-ref", batch, dt * 1e3, batch / dt, float("nan")))
        print(f"ik7-ref batch={batch}: {dt*1e3:.2f} ms/call, "
              f"{batch/dt:,.1f} solves/s", flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[1, 8, 32, 256, 1024, 4096])
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--reference", action="store_true")
    p.add_argument("--suite", nargs="+", default=["ik", "pgo"])
    args = p.parse_args(argv)

    if args.reference:
        bench_reference_ik(args.batches, min(args.reps, 3))
        return

    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    if "ik" in args.suite:
        bench_ours_ik(args.batches, args.reps)
    if "pgo" in args.suite:
        bench_ours_pgo(args.batches, args.reps)


if __name__ == "__main__":
    main()
