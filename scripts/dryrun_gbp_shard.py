"""Problem-axis sharding dryrun (VERDICT r3 stretch #8): ONE pose-graph
problem split across chips by FACTOR, not by batch — the TPU-native frontier
the reference never had (it is single-process; SURVEY §2.9).

GBP is the vehicle: a synchronous sweep is one batched step over every
factor, so sharding the factor axis of the message arrays partitions the
compute while XLA turns the per-variable belief scatter-adds into local
scatter + all-reduce over the mesh. This script:

  1. builds a 256-pose SE3 PGO (257 factor messages; the 256-edge Between
     bucket shards 8-way, the single prior replicates),
  2. runs one GBP solve single-device and factor-sharded on an 8-virtual-
     device CPU mesh (subprocess-forced, same mechanism as
     __graft_entry__.dryrun_multichip),
  3. asserts delta parity and that the compiled sharded program actually
     contains all-reduce collectives (proof the factor axis is partitioned,
     not silently replicated).

    python scripts/dryrun_gbp_shard.py [n_devices]
"""

import os
import pathlib
import re
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parents[1]


def main(n_devices: int = 8) -> None:
    if os.environ.get("_THESEUS_TPU_GBP_SHARD_CHILD") == "1":
        _impl(n_devices)
        return
    env = dict(os.environ)
    env["_THESEUS_TPU_GBP_SHARD_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    code = (f"import sys; sys.path.insert(0, {str(HERE)!r}); "
            f"sys.path.insert(0, {str(HERE / 'scripts')!r}); "
            f"import dryrun_gbp_shard as d; d.main({int(n_devices)})")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=str(HERE))
    if r.returncode != 0:
        raise RuntimeError(f"dryrun_gbp_shard({n_devices}) failed rc={r.returncode}")


def _impl(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(HERE))
    import theseus_tpu as tt
    from theseus_tpu.optim.gbp import GBPNormalBuilder
    from theseus_tpu.parallel import make_mesh, shard_gbp_factors
    from theseus_tpu.utils.examples.pose_graph import (build_pgo_objective,
                                                       pose_values,
                                                       synthetic_pose_graph)

    assert len(jax.devices()) >= n_devices

    n_poses, batch = 256, 2
    dtype = jnp.float32
    gt, edges, meas, init = synthetic_pose_graph(
        n_poses=n_poses, batch=batch, seed=0, dtype=dtype,
        extra_loop_closures=False)
    edges = edges + [(0, n_poses // 2)]  # 256 edges: shards 8-way
    from theseus_tpu.lie import se3
    closure = se3.compose(se3.inverse(gt[0]), gt[n_poses // 2])
    meas = jnp.concatenate([meas, closure[None]], axis=0)
    obj, _ = build_pgo_objective(n_poses, edges, meas, gt[0], dtype=dtype)
    co = obj.compile()
    values = obj.default_values(pose_values(init))
    state = co.pack(values, batch)
    aux = co.build_aux(values, batch)

    bld = GBPNormalBuilder(co, msg_iters=20, msg_damping=0.3)
    normal = bld.build(state, aux)

    def solve(lams, etas):
        from theseus_tpu.optim.gbp import GBPNormal
        ns = GBPNormal(bld, lams, etas, normal.dtype, normal.bsz)
        delta, bad = ns.solve(damping=1e-3)
        return delta

    jsolve = jax.jit(solve)
    d_ref = np.asarray(jsolve(normal.lams, normal.etas))

    mesh = make_mesh(n_devices, axis="factors")
    sharded = shard_gbp_factors(normal, mesh)
    lowered = jsolve.lower(sharded.lams, sharded.etas)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_allreduce = hlo.count("all-reduce")
    with mesh:
        d_sh = np.asarray(jsolve(sharded.lams, sharded.etas))

    np.testing.assert_allclose(d_ref, d_sh, rtol=2e-4, atol=1e-5)
    assert n_allreduce > 0, (
        "sharded GBP program contains no all-reduce: factor axis was "
        "silently replicated")
    print(f"dryrun_gbp_shard({n_devices}): poses={n_poses} factors="
          f"{len(edges)+1} devices={n_devices} all_reduces={n_allreduce} "
          f"max_dev={np.abs(d_ref - d_sh).max():.3e} parity_vs_1dev=ok")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
