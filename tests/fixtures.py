"""Synthetic dataset fixtures for both annotation dialects.

The reference has no test data generator; its smoke scripts require real
DREAM downloads. These fixtures synthesize geometrically-consistent frames
(keypoints from our FK chain, projected through a known K) so dataset /
training tests validate the full contract without any external data.
"""

import json
import pickle
from pathlib import Path

import numpy as np

from hrpe_tpu.kinematics import JOINT_NAMES, LINK_NAMES, load_robot

FX, FY, CX, CY = 320.0, 320.0, 320.0, 240.0
W, H = 640, 480


def _camera_json(dirpath: Path):
    (dirpath / "_camera_settings.json").write_text(
        json.dumps(
            {
                "camera_settings": [
                    {"intrinsic_settings": {"fx": FX, "fy": FY, "cx": CX, "cy": CY}}
                ]
            }
        )
    )


def _pose_for(seed):
    rng = np.random.RandomState(seed)
    # camera looks at the robot from ~1m
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), rng.uniform(0.9, 1.4)])
    a = rng.uniform(-0.3, 0.3, 3)
    from hrpe_tpu.utils.geometry import axis_angle_to_rotmat
    import jax.numpy as jnp

    base = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)  # face camera
    R = np.asarray(axis_angle_to_rotmat(jnp.asarray(a)[None]))[0] @ base
    return R, t


def _scene(robot_name, seed):
    import jax.numpy as jnp

    robot = load_robot(robot_name)
    rng = np.random.RandomState(seed)
    dof = robot.dof
    q = rng.uniform(-0.4, 0.4, dof)
    R, t = _pose_for(seed)
    kp_base = np.asarray(robot.keypoints_fk_only(jnp.asarray(q)[None]))[0]
    kp_cam = kp_base @ R.T + t
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    proj = kp_cam @ K.T
    kp2d = proj[:, :2] / proj[:, 2:3]
    return robot, q, R, t, kp_cam, kp2d


def _write_png(path: Path, seed):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def make_json_dataset(dirpath: Path, robot_name="panda", n=4):
    """Original DREAM json dialect fixture."""
    dirpath.mkdir(parents=True, exist_ok=True)
    _camera_json(dirpath)
    # DREAM keypoint names differ per robot
    from hrpe_tpu.data.dream import _DREAM_KP_TO_INDEX, _R_NORMAL_UE

    inv_names = {i: n for n, i in _DREAM_KP_TO_INDEX[robot_name].items()}
    for i in range(n):
        robot, q, R, t, kp_cam, kp2d = _scene(robot_name, seed=100 + i)
        _write_png(dirpath / f"{i:06d}.rgb.png", seed=i)
        # reference parsing: R_ann = R @ R_UE^-1 so that R_ann @ R_UE == R
        R_ann = R @ np.linalg.inv(_R_NORMAL_UE)
        # quaternion xyzw from R_ann
        from hrpe_tpu.utils.geometry import rotmat_to_quat
        import jax.numpy as jnp

        qwxyz = np.asarray(rotmat_to_quat(jnp.asarray(R_ann)[None]))[0]
        quat_xyzw = [float(qwxyz[1]), float(qwxyz[2]), float(qwxyz[3]), float(qwxyz[0])]
        joints = [
            {"name": f"/sim/{jn}", "position": float(v)}
            for jn, v in zip(JOINT_NAMES[robot_name], q)
        ]
        kps = [
            {
                "name": inv_names[k],
                "location": [float(v) for v in kp_cam[k]],
                "projected_location": [float(v) for v in kp2d[k]],
            }
            for k in range(kp_cam.shape[0])
        ]
        x1, y1 = kp2d.min(0) - 10
        x2, y2 = kp2d.max(0) + 10
        ann = {
            "objects": [
                {
                    "location": [float(v) for v in t],
                    "quaternion_xyzw": quat_xyzw,
                    "keypoints": kps,
                    "bounding_box": {"min": [float(x1), float(y1)], "max": [float(x2), float(y2)]},
                }
            ],
            "sim_state": {"joints": joints},
        }
        (dirpath / f"{i:06d}.json").write_text(json.dumps(ann))
    return dirpath


def make_pickle_dataset(dirpath: Path, robot_name="dofbot", n=4):
    """Isaac-Sim pickle dialect fixture (ref dream.py:140-308 format)."""
    dirpath.mkdir(parents=True, exist_ok=True)
    _camera_json(dirpath)
    link_names = LINK_NAMES[robot_name]
    for i in range(n):
        robot, q, R, t, kp_cam, kp2d = _scene(robot_name, seed=200 + i)
        _write_png(dirpath / f"{i:06d}.png", seed=i)
        # dialect: TCO is the ROOT-LINK (keypoint 1) pose — rotation of
        # link1's frame in camera coords (stored transposed), translation at
        # link1 (via keypoint_dict). The reference consumes it directly as
        # the root pose with reference_keypoint_id=1 (function.py:86-93).
        import jax.numpy as jnp

        TWL1 = np.asarray(robot.keypoint_poses(jnp.asarray(q)[None]))[0, 1, :3, :3]
        R = np.asarray(R) @ TWL1
        kp_dict = {
            f"/World/robot/{ln}": {
                "keypoint_positon": [float(v) for v in kp_cam[k]],
                "keypoint_projection": [float(v) for v in kp2d[k]],
            }
            for k, ln in enumerate(link_names)
        }
        x1, y1 = kp2d.min(0) - 10
        x2, y2 = kp2d.max(0) + 10
        ann = {
            "camera_ros_axes_to_robot_root_rot": R.T.tolist(),
            "dofbot_joint_names_positions": {
                jn: float(np.rad2deg(v))
                for jn, v in zip(JOINT_NAMES[robot_name], q)
            },
            "keypoint_dict": kp_dict,
            "robot_bounding_box_2d": {
                "x_min": float(x1), "y_min": float(y1),
                "x_max": float(x2), "y_max": float(y2),
            },
        }
        with open(dirpath / f"{i:06d}.pkl", "wb") as f:
            pickle.dump(ann, f)
    return dirpath
