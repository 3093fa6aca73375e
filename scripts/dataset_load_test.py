#!/usr/bin/env python
"""Dataloader smoke test with FK cross-validation (ref scripts/dataset_load_test.py).

Prints sample fields, cross-checks dataset 3D keypoints against chain FK
at the GT pose (the reference's only kinematics sanity check, :152-159),
and writes a bbox/keypoint overlay.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", default="configs/dofbot/load_dataset.yaml")
    p.add_argument("--dataset", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from hrpe_tpu.config import load_config
    from hrpe_tpu.data.dream import DreamDataset
    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.utils.geometry import rotmat_to_rot6d
    from hrpe_tpu.utils.vis import save_keypoint_overlay

    cfg = load_config(args.config)
    ds = DreamDataset(
        args.dataset or cfg.train_ds_names,
        color_jitter=False, rgb_augmentation=False, occlusion_augmentation=False,
        robot=cfg.urdf_robot_name,
    )
    print(f"dataset: {len(ds)} frames")
    s = ds[0]
    for k, v in s.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                print(f"  {k}/{k2}: {np.asarray(v2).shape}")
        else:
            print(f"  {k}: {np.asarray(v).shape}")

    robot = load_robot(cfg.urdf_robot_name)
    q = jnp.asarray(s["jointpose"])[None]
    TCO = s["TCO"]
    r6 = rotmat_to_rot6d(jnp.asarray(TCO[:3, :3])[None])
    t = jnp.asarray(TCO[:3, 3])[None]
    root = 1 if cfg.urdf_robot_name == "dofbot" else 0
    if root == 0:
        kp_fk = np.asarray(robot.keypoints_base(q, r6, t))[0]
    else:
        kp_fk = np.asarray(robot.keypoints_root(q, r6, t, root=root))[0]
    err = np.linalg.norm(kp_fk - s["keypoints_3d_original"], axis=-1)
    print(f"FK-vs-annotation keypoint error (m): mean {err.mean():.4f} max {err.max():.4f}")

    save_keypoint_overlay(
        "dataset_load_test_overlay.png",
        s["other"]["images"], s["other"]["keypoints_2d"],
    )
    print("wrote dataset_load_test_overlay.png")


if __name__ == "__main__":
    main()
