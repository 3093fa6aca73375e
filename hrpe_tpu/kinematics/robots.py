"""Built-in kinematic chains for the supported robots.

The reference loads URDFs from data/deps/ (lib/config.py:33-41); those
files are external data not shipped with the code. This module provides the
same four robots (+ owi535) as built-in `JointSpec` tables constructed from
the public robot descriptions, so the framework is usable without any data
download. When a real URDF is available, `load_robot(..., urdf_path=...)`
parses it instead (hrpe_tpu.kinematics.urdf).

Accuracy notes:
* panda: joint origins match the public franka_description URDF; all six
  limb lengths reproduce the reference's PANDA_LIMB_LENGTH table
  (const.py:108-115) exactly.
* kuka iiwa7: matches KUKA_LIMB_LENGTH (const.py:116-124) exactly.
* baxter / dofbot / owi535: best-effort public-spec geometry (the exact
  URDF variants the reference points at are not distributed with it);
  keypoint/link/joint naming and DoF match const.py:61-99 so every API and
  dataset contract holds.

Keypoint links and joint ordering follow the reference's tables
(const.py:61-99). Keypoint offsets are zero for panda/kuka/dofbot
(urdf_robot.py:62-67); for baxter they are the keypoint joints' origin
translations attached to the joint's PARENT link (urdf_robot.py:68-87).
"""

from __future__ import annotations

import numpy as np

from .chain import FIXED, PRISMATIC, REVOLUTE, JointSpec, KinematicChain
from .urdf import chain_from_urdf, make_origin

HPI = float(np.pi / 2)

# ---------------------------------------------------------------------------
# naming tables (parity with reference lib/dataset/const.py:61-99)
# ---------------------------------------------------------------------------

LINK_NAMES = {
    "panda": [
        "panda_link0", "panda_link2", "panda_link3", "panda_link4",
        "panda_link6", "panda_link7", "panda_hand",
    ],
    "kuka": [
        "iiwa_link_0", "iiwa_link_1", "iiwa_link_2", "iiwa_link_3",
        "iiwa_link_4", "iiwa_link_5", "iiwa_link_6", "iiwa_link_7",
    ],
    "baxter": [
        "torso", "right_upper_shoulder", "left_upper_shoulder",
        "right_lower_shoulder", "left_lower_shoulder", "right_upper_elbow",
        "left_upper_elbow", "right_lower_elbow", "left_lower_elbow",
        "right_upper_forearm", "left_upper_forearm", "right_lower_forearm",
        "left_lower_forearm", "right_wrist", "left_wrist", "right_hand",
        "left_hand",
    ],
    "owi535": ["Rotation", "Base", "Elbow", "Wrist"],
    "dofbot": [
        "base_link", "link1", "link2", "link3", "link4", "link5",
        "left_finger_1", "right_finger_1",
    ],
}

JOINT_NAMES = {
    "panda": [
        "panda_joint1", "panda_joint2", "panda_joint3", "panda_joint4",
        "panda_joint5", "panda_joint6", "panda_joint7", "panda_finger_joint1",
    ],
    "kuka": [
        "iiwa_joint_1", "iiwa_joint_2", "iiwa_joint_3", "iiwa_joint_4",
        "iiwa_joint_5", "iiwa_joint_6", "iiwa_joint_7",
    ],
    "baxter": [
        "head_pan", "right_s0", "left_s0", "right_s1", "left_s1",
        "right_e0", "left_e0", "right_e1", "left_e1", "right_w0", "left_w0",
        "right_w1", "left_w1", "right_w2", "left_w2",
    ],
    "owi535": ["Rotation", "Base", "Elbow", "Wrist"],
    "dofbot": ["joint1", "joint2", "joint3", "joint4", "joint5", "left_joint_1"],
}

ROBOT_DOF = {"panda": 8, "kuka": 7, "baxter": 15, "dofbot": 6, "owi535": 4}
ROBOT_NKPT = {"panda": 7, "kuka": 8, "baxter": 17, "dofbot": 8, "owi535": 4}

Z = np.array([0.0, 0.0, 1.0])
Y = np.array([0.0, 1.0, 0.0])
NY = np.array([0.0, -1.0, 0.0])


def _rev(name, parent, child, xyz, rpy, act, axis=Z, mult=1.0, off=0.0):
    return JointSpec(name, parent, child, REVOLUTE, make_origin(xyz, rpy), axis, act, mult, off)


def _fix(name, parent, child, xyz=(0, 0, 0), rpy=(0, 0, 0)):
    return JointSpec(name, parent, child, FIXED, make_origin(xyz, rpy), Z, -1)


def _pri(name, parent, child, xyz, rpy, act, axis, mult=1.0, off=0.0):
    return JointSpec(name, parent, child, PRISMATIC, make_origin(xyz, rpy), axis, act, mult, off)


# ---------------------------------------------------------------------------
# panda (franka_description public URDF geometry)
# ---------------------------------------------------------------------------

def _panda_chain() -> KinematicChain:
    j = [
        _rev("panda_joint1", "panda_link0", "panda_link1", (0, 0, 0.333), (0, 0, 0), 0),
        _rev("panda_joint2", "panda_link1", "panda_link2", (0, 0, 0), (-HPI, 0, 0), 1),
        _rev("panda_joint3", "panda_link2", "panda_link3", (0, -0.316, 0), (HPI, 0, 0), 2),
        _rev("panda_joint4", "panda_link3", "panda_link4", (0.0825, 0, 0), (HPI, 0, 0), 3),
        _rev("panda_joint5", "panda_link4", "panda_link5", (-0.0825, 0.384, 0), (-HPI, 0, 0), 4),
        _rev("panda_joint6", "panda_link5", "panda_link6", (0, 0, 0), (HPI, 0, 0), 5),
        _rev("panda_joint7", "panda_link6", "panda_link7", (0.088, 0, 0), (HPI, 0, 0), 6),
        _fix("panda_joint8", "panda_link7", "panda_link8", (0, 0, 0.107)),
        _fix("panda_hand_joint", "panda_link8", "panda_hand", (0, 0, 0), (0, 0, -np.pi / 4)),
        _pri("panda_finger_joint1", "panda_hand", "panda_leftfinger", (0, 0, 0.0584), (0, 0, 0), 7, Y),
        _pri("panda_finger_joint2", "panda_hand", "panda_rightfinger", (0, 0, 0.0584), (0, 0, 0), 7, NY),
    ]
    return KinematicChain(
        j, "panda_link0", LINK_NAMES["panda"],
        actuated_joint_names=JOINT_NAMES["panda"], name="panda",
    )


# ---------------------------------------------------------------------------
# kuka iiwa7 (public kuka iiwa_description geometry)
# ---------------------------------------------------------------------------

def _kuka_chain() -> KinematicChain:
    j = [
        _rev("iiwa_joint_1", "iiwa_link_0", "iiwa_link_1", (0, 0, 0.15), (0, 0, 0), 0),
        _rev("iiwa_joint_2", "iiwa_link_1", "iiwa_link_2", (0, 0, 0.19), (HPI, 0, np.pi), 1),
        _rev("iiwa_joint_3", "iiwa_link_2", "iiwa_link_3", (0, 0.21, 0), (HPI, 0, np.pi), 2),
        _rev("iiwa_joint_4", "iiwa_link_3", "iiwa_link_4", (0, 0, 0.19), (HPI, 0, 0), 3),
        _rev("iiwa_joint_5", "iiwa_link_4", "iiwa_link_5", (0, 0.21, 0), (-HPI, np.pi, 0), 4),
        _rev("iiwa_joint_6", "iiwa_link_5", "iiwa_link_6", (0, 0.06070, 0.19), (HPI, 0, 0), 5),
        _rev("iiwa_joint_7", "iiwa_link_6", "iiwa_link_7", (0, 0.081, 0.06070), (-HPI, np.pi, 0), 6),
    ]
    return KinematicChain(
        j, "iiwa_link_0", LINK_NAMES["kuka"],
        actuated_joint_names=JOINT_NAMES["kuka"], name="kuka",
    )


# ---------------------------------------------------------------------------
# baxter (rethink baxter_description geometry, mirrored arms)
# ---------------------------------------------------------------------------

def _baxter_side(side: str, sign: float, act):
    """One 7-DoF baxter arm; `act` maps joint suffix -> actuation index."""
    s = side
    return [
        _fix(f"{s}_torso_arm_mount", "torso", f"{s}_arm_mount",
             (0.024645, sign * 0.219645, 0.118588), (0, 0, sign * np.pi / 4)),
        _rev(f"{s}_s0", f"{s}_arm_mount", f"{s}_upper_shoulder",
             (0.055695, 0, 0.011038), (0, 0, 0), act["s0"]),
        _rev(f"{s}_s1", f"{s}_upper_shoulder", f"{s}_lower_shoulder",
             (0.069, 0, 0.27035), (-HPI, 0, 0), act["s1"]),
        _rev(f"{s}_e0", f"{s}_lower_shoulder", f"{s}_upper_elbow",
             (0.102, 0, 0), (HPI, 0, HPI), act["e0"]),
        _rev(f"{s}_e1", f"{s}_upper_elbow", f"{s}_lower_elbow",
             (0.069, 0, 0.26242), (-HPI, -HPI, 0), act["e1"]),
        _rev(f"{s}_w0", f"{s}_lower_elbow", f"{s}_upper_forearm",
             (0.10359, 0, 0), (HPI, 0, HPI), act["w0"]),
        _rev(f"{s}_w1", f"{s}_upper_forearm", f"{s}_lower_forearm",
             (0.01, 0, 0.2707), (-HPI, -HPI, 0), act["w1"]),
        _rev(f"{s}_w2", f"{s}_lower_forearm", f"{s}_wrist",
             (0.115975, 0, 0), (HPI, 0, HPI), act["w2"]),
        _fix(f"{s}_hand_joint", f"{s}_wrist", f"{s}_hand", (0, 0, 0.11355)),
    ]


def _baxter_chain() -> KinematicChain:
    names = JOINT_NAMES["baxter"]
    idx = {n: i for i, n in enumerate(names)}
    right = {k: idx[f"right_{k}"] for k in ["s0", "s1", "e0", "e1", "w0", "w1", "w2"]}
    left = {k: idx[f"left_{k}"] for k in ["s0", "s1", "e0", "e1", "w0", "w1", "w2"]}
    j = (
        [
            _fix("torso_t0", "base", "torso"),
            _rev("head_pan", "torso", "head", (0.06, 0, 0.686), (0, 0, 0), idx["head_pan"]),
        ]
        + _baxter_side("right", -1.0, right)
        + _baxter_side("left", +1.0, left)
    )
    # keypoint offsets: the reference attaches each keypoint to the PARENT
    # link of its namesake joint, offset by the joint origin translation
    # (urdf_robot.py:68-87). Reproduce that mapping here.
    joint_map = {spec.name: spec for spec in j}
    kp_joint_names = [
        "torso_t0", "right_s0", "left_s0", "right_s1", "left_s1",
        "right_e0", "left_e0", "right_e1", "left_e1", "right_w0", "left_w0",
        "right_w1", "left_w1", "right_w2", "left_w2",
        "right_hand_joint", "left_hand_joint",
    ]
    kp_links = [joint_map[n].parent_link for n in kp_joint_names]
    kp_offsets = np.stack([joint_map[n].origin[:3, 3] for n in kp_joint_names])
    return KinematicChain(
        j, "base", kp_links, kp_offsets,
        actuated_joint_names=names, name="baxter",
    )


# ---------------------------------------------------------------------------
# dofbot (Yahboom DOFBOT-style 6-DoF arm; geometry approximated from the
# public description — the exact dofbot-simple.urdf is not distributed)
# ---------------------------------------------------------------------------

def _dofbot_chain() -> KinematicChain:
    j = [
        _rev("joint1", "base_link", "link1", (0, 0, 0.0661), (0, 0, 0), 0, Z),
        _rev("joint2", "link1", "link2", (0, 0, 0.04145), (HPI, 0, 0), 1, Z),
        _rev("joint3", "link2", "link3", (0, -0.08285, 0), (0, 0, 0), 2, Z),
        _rev("joint4", "link3", "link4", (0, -0.08285, 0), (0, 0, 0), 3, Z),
        _rev("joint5", "link4", "link5", (0, -0.07385, 0), (-HPI, 0, 0), 4, Z),
        _rev("left_joint_1", "link5", "left_finger_1", (-0.0125, 0, 0.0858), (0, 0, 0), 5, Y),
        _rev("right_joint_1", "link5", "right_finger_1", (0.0125, 0, 0.0858), (0, 0, 0), 5, NY),
    ]
    return KinematicChain(
        j, "base_link", LINK_NAMES["dofbot"],
        actuated_joint_names=JOINT_NAMES["dofbot"], name="dofbot",
    )


# ---------------------------------------------------------------------------
# owi535 (4-DoF toy arm)
# ---------------------------------------------------------------------------

def _owi_chain() -> KinematicChain:
    j = [
        _fix("base_fix", "base", "Rotation", (0, 0, 0)),
        _rev("Rotation", "Rotation", "Base", (0, 0, 0.057), (0, 0, 0), 0, Z),
        _rev("Base", "Base", "Elbow", (0, 0, 0.066), (HPI, 0, 0), 1, Z),
        _rev("Elbow", "Elbow", "Wrist", (0, -0.09, 0), (0, 0, 0), 2, Z),
        _rev("Wrist", "Wrist", "Gripper", (0, -0.065, 0), (0, 0, 0), 3, Z),
    ]
    return KinematicChain(
        j, "base", LINK_NAMES["owi535"],
        actuated_joint_names=JOINT_NAMES["owi535"], name="owi535",
    )


_BUILDERS = {
    "panda": _panda_chain,
    "kuka": _kuka_chain,
    "baxter": _baxter_chain,
    "dofbot": _dofbot_chain,
    "owi535": _owi_chain,
    "owi": _owi_chain,
}

_CACHE: dict = {}


def load_robot(robot_type: str, urdf_path: str | None = None) -> KinematicChain:
    """Load a robot chain: from a URDF file if given, else the built-in table.

    Equivalent of `URDFRobot(robot_type)` (urdf_robot.py:22-59), but the
    result is a static pytree-backed chain usable inside jit.
    """
    if urdf_path is not None:
        if robot_type == "baxter":
            # baxter keypoints attach to the PARENT links of named joints,
            # offset by each joint's origin translation (urdf_robot.py:68-87)
            from .urdf import parse_urdf

            parsed = parse_urdf(urdf_path)
            jmap = {name: (parent, origin)
                    for (name, _, parent, _, origin, _) in parsed.joints}
            kp_joint_names = [
                "torso_t0", "right_s0", "left_s0", "right_s1", "left_s1",
                "right_e0", "left_e0", "right_e1", "left_e1", "right_w0",
                "left_w0", "right_w1", "left_w1", "right_w2", "left_w2",
                "right_hand_joint", "left_hand_joint",
            ]
            # some baxter URDFs name the hand joints differently
            for alt in ["right_hand", "left_hand"]:
                if alt in jmap and f"{alt}_joint" not in jmap:
                    jmap[f"{alt}_joint"] = jmap[alt]
            kp_links = [jmap[n][0] for n in kp_joint_names]
            offsets = np.stack([jmap[n][1][:3, 3] for n in kp_joint_names])
            return chain_from_urdf(
                urdf_path, kp_links, JOINT_NAMES[robot_type], offsets,
                name=robot_type,
            )
        return chain_from_urdf(
            urdf_path,
            LINK_NAMES[robot_type],
            JOINT_NAMES[robot_type],
            None,
            name=robot_type,
        )
    if robot_type not in _CACHE:
        _CACHE[robot_type] = _BUILDERS[robot_type]()
    return _CACHE[robot_type]
