"""Dense photometric homography estimation (reference
examples/homography_estimation.py:333): estimate the 8-dof homography
between an image pair by minimizing the per-pixel intensity residual with LM;
the residual is an AutoDiffCostFunction over bilinear sampling (the
reference's grid_sample ablation collapses to one trace-time vmap here)."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import _config
import theseus_tpu as tt
from theseus_tpu.utils.warp import bilinear_sample, homography_transform, image_grid


def smooth_image(key, h, w, octaves=4):
    img = jnp.zeros((h, w))
    for o in range(octaves):
        k1, key = jax.random.split(key)
        hs, ws = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        noise = jax.random.uniform(k1, (hs, ws))
        img = img + jax.image.resize(noise, (h, w), "bilinear") / (o + 1)
    return img / img.max()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=60)
    p.add_argument("--width", type=int, default=80)
    p.add_argument("--max-iterations", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    args = _config.parse_with_config(p, argv)

    h, w = args.height, args.width
    key = jax.random.PRNGKey(args.seed)
    img1 = smooth_image(key, h, w)

    h_true = jnp.asarray([1.02, 0.01, 1.5, -0.02, 0.98, -1.0, 1e-4, -5e-5])
    grid = image_grid(h, w)
    img2 = bilinear_sample(img1, homography_transform(h_true, grid)).reshape(h, w)

    # estimate homography from img2 -> img1 over an interior patch
    patch = image_grid(h - 16, w - 16) + 8.0
    target_vals = bilinear_sample(img2, patch)

    h8 = tt.Vector(8, name="h8")
    img_var = tt.Variable(img1[None], name="img1")
    tgt_var = tt.Variable(target_vals[None], name="target")

    def err_fn(optim, aux):
        (h8,) = optim
        img, tgt = aux
        warped = bilinear_sample(img, homography_transform(h8, patch))
        return warped - tgt

    obj = tt.Objective()
    obj.add(
        tt.AutoDiffCostFunction(
            [h8], patch.shape[0], err_fn, aux_vars=[img_var, tgt_var], name="photo"
        )
    )
    opt = tt.LevenbergMarquardt(obj, max_iterations=args.max_iterations,
                                adaptive_damping=True)
    layer = tt.TheseusLayer(opt)
    init = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0, 0, 0]])
    values, info = layer.forward({"h8": init})
    est = np.asarray(values["h8"])[0]
    print("true h8:", np.asarray(h_true))
    print("est  h8:", est)
    print("final photometric err:", float(info.last_err[0]))
    assert np.abs(est - np.asarray(h_true)).max() < 0.2


if __name__ == "__main__":
    main()
