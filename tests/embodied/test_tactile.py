"""Tactile pose estimation: the full objective (quasi-static dynamics +
moving-frame tactile measurements + contact + mocap priors) solves and is
differentiable wrt the learnable weight aux vars."""

import jax
import jax.numpy as jnp
import numpy as np

import theseus_tpu as tt
from theseus_tpu.embodied import occupancy_to_sdf
from theseus_tpu.lie import se2
from theseus_tpu.utils.examples.tactile_pose_estimation import TactilePoseEstimator


def make_inputs(est, key, dtype=jnp.float64):
    t = est.time_steps
    # simulate a straight push: object and effector move together in +x
    xs = jnp.linspace(0.1, 0.2, t, dtype=dtype)
    obj_gt = jnp.stack([xs, jnp.full_like(xs, 0.16), jnp.ones_like(xs), jnp.zeros_like(xs)], -1)
    eff_gt = obj_gt.at[:, 0].add(-0.03)

    occ = np.zeros((32, 32))
    occ[12:20, 12:20] = 1.0
    sdf = occupancy_to_sdf(occ, 0.01)

    inputs = {"obj_start_pose": obj_gt[:1], "sdf_data": jnp.asarray(sdf)[None]}
    for i in range(t):
        inputs[f"motion_capture_{i}"] = eff_gt[i][None]
        inputs[f"obj_pose_{i}"] = obj_gt[0][None]
        inputs[f"eff_pose_{i}"] = eff_gt[i][None]
    for (a, b) in est.pairs:
        rel = se2.compose(
            se2.inverse(se2.compose(se2.inverse(obj_gt[a]), eff_gt[a])),
            se2.compose(se2.inverse(obj_gt[b]), eff_gt[b]),
        )
        inputs[f"nn_measurement_{a}_{b}"] = rel[None]
    return inputs, obj_gt


def test_tactile_estimator_solves_and_differentiates():
    est = TactilePoseEstimator(time_steps=5, max_iterations=5)
    inputs, obj_gt = make_inputs(est, jax.random.PRNGKey(0))
    values, info = est.forward(inputs)
    assert np.all(np.asarray(info.status) != tt.NonlinearOptimizerStatus.FAIL)
    # objects should track the push direction (x increasing)
    x_first = float(values["obj_pose_0"][0, 0])
    x_last = float(values[f"obj_pose_{est.time_steps-1}"][0, 0])
    assert x_last > x_first

    # gradient wrt the learnable moving-frame weight flows through the solve
    co = est.objective.compile()
    vals = est.objective.default_values(inputs)
    state = co.pack(vals, 1)

    def loss(w):
        v2 = dict(vals)
        v2["mf_between_weight"] = w * jnp.ones((1, 3), jnp.float64)
        aux = co.build_aux(v2, 1)
        carry = est.layer.solve_state(state, aux, "implicit", est.optimizer.opts)
        sol = co.unpack(carry["state"])
        last = sol[f"obj_pose_{est.time_steps-1}"]
        return jnp.sum((last[:, :2] - obj_gt[-1, :2]) ** 2)

    g = jax.grad(loss)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(float(g))


def test_tactile_trainer_step():
    from theseus_tpu.utils.examples.tactile_pose_estimation import TactileTrainer

    est = TactilePoseEstimator(time_steps=4, max_iterations=3)
    inputs, obj_gt = make_inputs(est, jax.random.PRNGKey(1))
    # drop the nn measurements; the trainer's model fills them in
    base = {k: v for k, v in inputs.items() if not k.startswith("nn_measurement")}
    feat_dim = 6
    feats = {i: jnp.ones((1, feat_dim)) * (i + 1) for i in range(est.time_steps)}
    trainer = TactileTrainer(est, feat_dim, lr=1e-3)
    l0 = trainer.step(base, feats, obj_gt)
    l1 = trainer.step(base, feats, obj_gt)
    assert np.isfinite(l0) and np.isfinite(l1)
