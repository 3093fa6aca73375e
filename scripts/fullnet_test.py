#!/usr/bin/env python
"""Single-image inference smoke test (ref scripts/fullnet_test.py).

Loads the first sample of a dataset, runs the full network, projects the
predicted 3D keypoints through the crop-space K and writes
output_image_with_keypoints.png. Works with random weights (smoke) or a
checkpoint (--ckpt, orbax dir or torch .pk via the importer).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", default="configs/dofbot/load_dataset.yaml")
    p.add_argument("--dataset", default=None, help="override dataset dir")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="output_image_with_keypoints.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hrpe_tpu.config import load_config
    from hrpe_tpu.data.dream import DreamDataset, collate
    from hrpe_tpu.engine.losses import k_values
    from hrpe_tpu.models import build_full_net
    from hrpe_tpu.utils.geometry import project_points
    from hrpe_tpu.utils.vis import save_keypoint_overlay

    cfg = load_config(args.config)
    ds_path = args.dataset or cfg.train_ds_names
    ds = DreamDataset(
        ds_path, color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False, robot=cfg.urdf_robot_name,
    )
    batch = collate([ds[0]])

    model = build_full_net(cfg.full_net_config())
    reg = jnp.asarray(batch["other_images"], jnp.float32) / 255.0
    root = jnp.asarray(batch["root_images"], jnp.float32) / 255.0
    K = jnp.asarray(batch["other_K"])
    if cfg.use_extended_bbox:
        kv = k_values(jnp.asarray(batch["root_bbox_gt2d_extended"]), jnp.asarray(batch["root_K"]))
    else:
        kv = k_values(jnp.asarray(batch["root_bbox_strict_bounded"]), jnp.asarray(batch["root_K"]))

    variables = jax.jit(lambda r: model.init(r, reg, root, kv, K, train=False))(
        jax.random.PRNGKey(0)
    )
    if args.ckpt:
        if os.path.isdir(args.ckpt):
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
            variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
        else:
            from hrpe_tpu.utils.checkpoint_io import (
                import_state_dict, load_torch_state_dict, translate_fullnet_key,
            )

            sd = load_torch_state_dict(args.ckpt)
            variables, report = import_state_dict(
                sd, variables,
                lambda k: translate_fullnet_key(k, cfg.backbone_name.startswith("resnet")),
            )
            print(f"imported {report['loaded']} tensors; skipped {len(report['skipped'])}")

    out = jax.jit(lambda v: model.apply(v, reg, root, kv, K, train=False))(variables)
    kp2d = np.asarray(project_points(K, out["xyz_int"]))[0]
    gt2d = batch["other_keypoints_2d"][0]
    save_keypoint_overlay(args.out, batch["other_images"][0], kp2d, gt2d)
    print(f"wrote {args.out}")
    print("pred pose:", np.asarray(out["pose"])[0])
    print("pred depth:", float(out["depth"][0, 0]))


if __name__ == "__main__":
    main()
