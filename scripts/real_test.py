#!/usr/bin/env python
"""Standalone single-image inference from a raw frame (ref scripts/real_test.py).

Replicates the dataset preprocessing inline — the minimal-inference recipe:
raw image + intrinsics + a bbox -> square crop -> 256x256 resize with K
update -> forward -> keypoint overlay. Use this as the template for
deploying the model on live camera frames.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def preprocess_frame(rgb, K, bbox, out_size=256):
    """Raw frame -> (crop (S,S,3) uint8, K_crop (3,3)). Mirrors the
    dataset path (dream.py crop semantics) without annotations."""
    import jax.numpy as jnp

    from hrpe_tpu.data import bbox as BB
    from hrpe_tpu.utils import geometry as G
    from PIL import Image

    h, w = rgb.shape[:2]
    bbox = BB.expand_bbox(np.asarray(bbox, np.float64), w, h, strict=True)
    crop, K_c, _ = BB.square_pad_crop(rgb, bbox, K, np.zeros((1, 2)))
    side = crop.shape[0]
    img = Image.fromarray(crop).resize((out_size, out_size), Image.BILINEAR)
    box = jnp.asarray([[0.0, 0.0, side, side]])
    K_r = np.asarray(
        G.get_K_crop_resize(jnp.asarray(K_c)[None], box, (out_size, out_size))
    )[0]
    return np.asarray(img), K_r


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--config", "-c", default="configs/panda/full.yaml")
    p.add_argument("--camera", default="realsense", help="intrinsics preset")
    p.add_argument("--bbox", nargs=4, type=float, default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="real_test_overlay.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from hrpe_tpu.config import load_config
    from hrpe_tpu.data.const import INTRINSICS_DICT
    from hrpe_tpu.engine.losses import k_values
    from hrpe_tpu.models import build_full_net
    from hrpe_tpu.utils.geometry import project_points
    from hrpe_tpu.utils.vis import save_keypoint_overlay

    cfg = load_config(args.config)
    rgb = np.asarray(Image.open(args.image).convert("RGB"))
    fx, fy, cx, cy = INTRINSICS_DICT[args.camera]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    h, w = rgb.shape[:2]
    bbox = args.bbox or [w * 0.25, h * 0.25, w * 0.75, h * 0.75]

    crop, K_crop = preprocess_frame(rgb, K, bbox)
    S = crop.shape[0]
    reg = jnp.asarray(crop, jnp.float32)[None] / 255.0
    Kb = jnp.asarray(K_crop, jnp.float32)[None]
    kv = k_values(jnp.asarray([[0.0, 0.0, S, S]], jnp.float32), Kb)

    model = build_full_net(cfg.full_net_config())
    variables = jax.jit(
        lambda r: model.init(r, reg, reg, kv, Kb, train=False)
    )(jax.random.PRNGKey(0))
    if args.ckpt and os.path.isdir(args.ckpt):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    out = jax.jit(lambda v: model.apply(v, reg, reg, kv, Kb, train=False))(variables)
    kp2d = np.asarray(project_points(Kb, out["xyz_int"]))[0]
    save_keypoint_overlay(args.out, crop, kp2d)
    print(f"wrote {args.out}; pred depth {float(out['depth'][0,0]):.3f} m")


if __name__ == "__main__":
    main()
