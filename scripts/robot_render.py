#!/usr/bin/env python
"""GT-pose render sanity check (ref scripts/robot_render.py).

Renders the soft silhouette and keypoint overlay for a dataset sample at
its ground-truth pose — verifying renderer + rotation conventions
end-to-end. Outputs go to visualization_output/.
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
    p.add_argument("--index", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from hrpe_tpu.config import load_config
    from hrpe_tpu.data.dream import DreamDataset
    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.render import RobotMesh, default_link_meshes, soft_silhouette
    from hrpe_tpu.utils.geometry import rotmat_to_rot6d
    from hrpe_tpu.utils.vis import save_keypoint_overlay, save_mask_overlay

    cfg = load_config(args.config)
    ds = DreamDataset(
        args.dataset or cfg.train_ds_names,
        color_jitter=False, rgb_augmentation=False, occlusion_augmentation=False,
        robot=cfg.urdf_robot_name, include_original=True,
    )
    s = ds[args.index]
    os.makedirs("visualization_output", exist_ok=True)

    robot = load_robot(cfg.urdf_robot_name)
    rm = RobotMesh(robot, default_link_meshes(robot))
    q = jnp.asarray(s["jointpose"])[None]
    TCO = jnp.asarray(s["TCO"])[None]
    # the dofbot pickle dialect's TCO translation is the link1 (root
    # keypoint) position — re-express as base->camera for mesh posing
    # (ref urdf_robot.py:293-309 renders at a specific root)
    root = cfg.reference_keypoint_id
    if root != 0:
        from hrpe_tpu.utils.geometry import rotmat_to_rot6d

        r6 = rotmat_to_rot6d(TCO[:, :3, :3])
        TCO = robot.root_to_base_pose(q, r6, TCO[:, :3, 3], root)
    verts = rm.posed_verts(q, TCO)
    H, W = s["images_original"].shape[:2]
    K_half = np.asarray(s["K_original"], np.float64) * 0.5  # render at 0.5x
    K_half[2, 2] = 1.0
    mask = np.asarray(
        soft_silhouette(
            verts[0], rm.faces, jnp.asarray(K_half), (H // 2, W // 2),
            sigma=1e-4,
        )
    )
    save_mask_overlay(
        "visualization_output/gt_pose_mask.png", s["images_original"], mask
    )
    save_keypoint_overlay(
        "visualization_output/gt_pose_keypoints.png",
        s["images_original"], s["keypoints_2d_original"],
    )
    # shaded (Lambert/Phong-style) render over the image — the host-side
    # twin of the reference's pyrender textured visualization
    # (ref urdf_robot.py:311-422, mesh_renderer.py:164-179)
    from PIL import Image

    from hrpe_tpu.render.shade import save_shaded_render

    bg = np.asarray(
        Image.fromarray(s["images_original"]).resize((W // 2, H // 2)),
        np.uint8,
    )
    save_shaded_render(
        "visualization_output/gt_pose_shaded.png",
        rm, s["jointpose"], np.asarray(TCO[0]), K_half, (H // 2, W // 2),
        background=(bg * 0.4).astype(np.uint8),
    )
    print("wrote visualization_output/gt_pose_{mask,keypoints,shaded}.png")
    print(f"mask coverage: {mask.mean():.4f}")


if __name__ == "__main__":
    main()
