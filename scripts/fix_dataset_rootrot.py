#!/usr/bin/env python
"""Rewrite pickle annotations from base-rotation to root-link-rotation.

Rounds 1-3 generated datasets whose `camera_ros_axes_to_robot_root_rot`
stored the BASE rotation while the translation is link1's position. The
dialect (and the reference's training, function.py:86-93) treats that
field as the ROOT-LINK (keypoint 1) pose, so the rot target disagreed
with the FK keypoint losses by up to 8 cm systematically. This script
converts existing datasets in place: R_root = R_base @ R_link1_in_base(q).

Idempotent: stamps `root_rot_convention: "link1"` and skips stamped files.

Usage: python scripts/fix_dataset_rootrot.py data/dofbot_synth_train_dr [...]
"""

import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HRPE_FORCE_CPU"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def fix_dir(path: str, robot_name: str = "dofbot") -> None:
    import jax.numpy as jnp

    from hrpe_tpu.data.const import JOINT_NAMES
    from hrpe_tpu.kinematics import load_robot

    robot = load_robot(robot_name)
    joint_names = JOINT_NAMES[robot_name]
    pkls = sorted(glob.glob(os.path.join(path, "*.pkl")))
    todo, anns = [], []
    for p in pkls:
        with open(p, "rb") as f:
            ann = pickle.load(f)
        if ann.get("root_rot_convention") == "link1":
            continue
        todo.append(p)
        anns.append(ann)
    if not todo:
        print(f"{path}: all {len(pkls)} annotations already link1-convention")
        return
    q = np.asarray(
        [
            [np.deg2rad(float(a["dofbot_joint_names_positions"][j]))
             for j in joint_names]
            for a in anns
        ]
    )
    TWL1 = np.asarray(robot.keypoint_poses(jnp.asarray(q)))[:, 1, :3, :3]
    for p, ann, T1 in zip(todo, anns, TWL1):
        R_base = np.asarray(ann["camera_ros_axes_to_robot_root_rot"]).T
        R_root = R_base @ T1
        ann["camera_ros_axes_to_robot_root_rot"] = R_root.T.tolist()
        ann["root_rot_convention"] = "link1"
        with open(p, "wb") as f:
            pickle.dump(ann, f)
    print(f"{path}: rewrote {len(todo)} / {len(pkls)} annotations")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        fix_dir(d)
