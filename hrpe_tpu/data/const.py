"""Dataset/robot constant tables (parity with reference lib/dataset/const.py).

These are physical/dataset facts (keypoint sets, joint orderings, joint
limits, camera intrinsics), restated from the reference tables
(const.py:61-293) so every API contract (joint-vector ordering, keypoint
count, bounds used by the 1-D integral head) matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ..kinematics.robots import JOINT_NAMES, LINK_NAMES, ROBOT_DOF, ROBOT_NKPT  # noqa: F401

# joint index -> keypoint index used for the joint-validity mask
# (ref const.py:93-99)
JOINT_TO_KP = {
    "panda": [1, 1, 2, 3, 4, 4, 5, 6],
    "kuka": [1, 2, 3, 4, 5, 6, 7],
    "baxter": list(range(1, 16)),
    "owi535": [0, 1, 2, 3],
    "dofbot": [0, 1, 2, 3, 4, 5],
}

# baxter left/right keypoint swap pairs for flip augmentation
# (ref const.py:106)
FLIP_PAIRS_BAXTER = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]

# joint angle bounds [lower, upper] in the JOINT_NAMES ordering
# (ref const.py:239-284)
JOINT_BOUNDS = {
    "panda": np.array(
        [
            [-2.9671, 2.9671], [-1.8326, 1.8326], [-2.9671, 2.9671],
            [-3.1416, 0.0873], [-2.9671, 2.9671], [-0.0873, 3.8223],
            [-2.9671, 2.9671], [0.0000, 0.0400],
        ],
        np.float32,
    ),
    "kuka": np.array(
        [
            [-2.9671, 2.9671], [-2.0944, 2.0944], [-2.9671, 2.9671],
            [-2.0944, 2.0944], [-2.9671, 2.9671], [-2.0944, 2.0944],
            [-3.0543, 3.0543],
        ],
        np.float32,
    ),
    "baxter": np.array(
        [
            [-1.5708, 1.5708], [-1.7017, 1.7017], [-1.7017, 1.7017],
            [-2.1470, 1.0470], [-2.1470, 1.0470], [-3.0542, 3.0542],
            [-3.0542, 3.0542], [-0.0500, 2.6180], [-0.0500, 2.6180],
            [-3.0590, 3.0590], [-3.0590, 3.0590], [-1.5708, 2.0940],
            [-1.5708, 2.0940], [-3.0590, 3.0590], [-3.0590, 3.0590],
        ],
        np.float32,
    ),
    "owi535": np.array(
        [
            [-2.268928, 2.268928], [-1.570796, 1.047198],
            [-1.047198, 1.570796], [-0.785398, 0.785398],
        ],
        np.float32,
    ),
    "dofbot": np.array(
        [
            [-1.5707999, 1.5707999], [-1.0995574, 2.0420351],
            [-2.3736477, 0.76794487], [-3.2288592, -0.08726646],
            [-1.5707999, 1.5707999], [-0.61086524, 1.0471976],
        ],
        np.float32,
    ),
}

# initial joint angles: 'zero' and 'mean' pose tables in JOINT_NAMES order
# (ref const.py:132-237). Only the non-zero means are listed; everything
# else defaults to 0.
_MEAN_NONZERO = {
    "panda": {"panda_joint4": -1.52715, "panda_joint6": 1.8675, "panda_finger_joint1": 0.02},
    "baxter": {
        "right_s1": -0.55, "left_s1": -0.55,
        "right_e1": 1.284, "left_e1": 1.284,
        "right_w1": 0.2616018366049999, "left_w1": 0.2616018366049999,
    },
    "owi535": {"Base": -0.523598, "Elbow": 0.523598},
}


def initial_joint_angles(robot: str, kind: str = "mean") -> np.ndarray:
    names = JOINT_NAMES[robot]
    q = np.zeros(len(names), np.float32)
    if kind == "mean":
        table = _MEAN_NONZERO.get(robot, {})
        for i, n in enumerate(names):
            q[i] = table.get(n, 0.0)
    return q


# real-camera intrinsics (fx, fy, cx, cy) (ref const.py:287-293)
INTRINSICS_DICT = {
    "azure": (399.6578776041667, 399.4959309895833, 319.8955891927083, 244.0602823893229),
    "kinect": (525.0, 525.0, 319.5, 239.5),
    "realsense": (615.52392578125, 615.2191772460938, 328.2606506347656, 251.7917022705078),
    "orb": (615.52392578125, 615.2191772460938, 328.2606506347656, 251.7917022705078),
    "orbbec": (545.77313, 545.77313, 320, 240),
}

# limb-length goldens (ref const.py:108-129) — used by tests
PANDA_LIMB_LENGTH = [0.3330, 0.3160, 0.0825, 0.39276, 0.0880, 0.1070]
KUKA_LIMB_LENGTH = [0.1500, 0.1900, 0.2100, 0.1900, 0.2100, 0.19946, 0.10122]
