"""Batched forward kinematics as a compiled XLA graph.

The reference walks the URDF kinematic graph in Python per call
(urdfpytorch/urdf.py:3064-3167 `link_fk_batch`, with per-joint 4x4 chains
built at runtime). TPU-first design instead does all graph analysis once on
the host, producing a static, topologically-sorted `KinematicChain` whose
FK is a fixed sequence of batched 4x4 composes — fully unrolled at trace
time (chains are <= ~20 joints), so XLA sees one static graph per robot and
fuses it into the surrounding step function. No host syncs, no Python in
the hot loop.

Keypoint APIs mirror lib/utils/urdf_robot.py:
  keypoints_base    <- URDFRobot.get_keypoints          (:95-122)
  keypoints_root    <- URDFRobot.get_keypoints_root     (:193-223)
  keypoints_fk_only <- URDFRobot.get_keypoints_only_fk  (:165-190)
  rotation_at_root  <- URDFRobot.get_rotation_at_specific_root (:137-162)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import (
    invert_T,
    make_T,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rot9d_to_rotmat,
    rotmat_to_quat,
    rotmat_to_rot6d,
)

Array = jax.Array

# joint types
FIXED = 0
REVOLUTE = 1  # includes 'continuous'
PRISMATIC = 2


@dataclasses.dataclass(frozen=True)
class JointSpec:
    """Static description of one joint (host-side)."""

    name: str
    parent_link: str
    child_link: str
    joint_type: int
    origin: np.ndarray  # (4, 4) fixed transform parent->joint frame
    axis: np.ndarray  # (3,)
    # actuation: index into the actuated-joint vector, or -1 if fixed.
    # mimic joints reuse another joint's index with multiplier/offset.
    act_index: int = -1
    mimic_multiplier: float = 1.0
    mimic_offset: float = 0.0


class KinematicChain:
    """Static kinematic tree with device-side batched FK.

    Built once on the host from `JointSpec`s (from a URDF file or a built-in
    robot table); afterwards every method is pure jnp and jit/vmap/grad-safe.
    """

    def __init__(
        self,
        joints: Sequence[JointSpec],
        root_link: str,
        keypoint_links: Sequence[str],
        keypoint_offsets: np.ndarray | None = None,
        actuated_joint_names: Sequence[str] | None = None,
        name: str = "robot",
    ):
        self.name = name
        self.root_link = root_link
        self.keypoint_links = list(keypoint_links)

        # topological sort: parents before children
        joints = list(joints)
        placed_links = {root_link}
        ordered: list[JointSpec] = []
        pending = list(joints)
        while pending:
            progressed = False
            for j in list(pending):
                if j.parent_link in placed_links:
                    ordered.append(j)
                    placed_links.add(j.child_link)
                    pending.remove(j)
                    progressed = True
            if not progressed:
                missing = [(j.name, j.parent_link) for j in pending]
                raise ValueError(f"kinematic tree disconnected at {missing}")
        self.joints = ordered

        self.link_names = [root_link] + [j.child_link for j in ordered]
        self._link_index = {n: i for i, n in enumerate(self.link_names)}
        # parent link pose index for each joint (always < its own pose index)
        self._parent_index = np.array(
            [self._link_index[j.parent_link] for j in ordered], dtype=np.int32
        )

        if actuated_joint_names is not None:
            self.actuated_joint_names = list(actuated_joint_names)
        else:
            self.actuated_joint_names = [
                j.name for j in ordered if j.joint_type != FIXED and j.act_index >= 0
            ]
        self.dof = (
            max((j.act_index for j in ordered if j.act_index >= 0), default=-1) + 1
        )

        # static per-joint tensors — kept as NUMPY so a chain instance can
        # be cached and reused across jit traces without leaking tracers
        # (jnp constants created inside a trace are trace-local)
        self._origins = np.stack([j.origin for j in ordered]).astype(np.float32)
        self._axes = np.stack([j.axis for j in ordered]).astype(np.float32)
        self._types = [j.joint_type for j in ordered]
        self._act = [(j.act_index, j.mimic_multiplier, j.mimic_offset) for j in ordered]

        self._kp_pose_index = np.array(
            [self._link_index[n] for n in self.keypoint_links], dtype=np.int32
        )
        self.num_keypoints = len(self.keypoint_links)
        if keypoint_offsets is None:
            keypoint_offsets = np.zeros((self.num_keypoints, 3), np.float32)
        self.keypoint_offsets = np.asarray(keypoint_offsets, np.float32)  # (nkpt, 3)

    # ------------------------------------------------------------------
    # core FK
    # ------------------------------------------------------------------

    def _joint_local(self, q: Array) -> Array:
        """Per-joint local transforms (B, J, 4, 4) from joint vector (B, dof).

        Rotation about a unit axis by angle t uses the Rodrigues closed form;
        prismatic joints translate along the axis. All J transforms are
        computed in one batched pass (no per-joint kernels).
        """
        B = q.shape[0]
        J = len(self.joints)
        # gather actuation values with mimic handling -> (B, J)
        cols = []
        for act_index, mult, off in self._act:
            if act_index < 0:
                cols.append(jnp.zeros((B,), q.dtype))
            else:
                cols.append(q[:, act_index] * mult + off)
        t = jnp.stack(cols, axis=1)  # (B, J)

        axes = jnp.asarray(self._axes)  # (J, 3)
        ct = jnp.cos(t)[..., None, None]  # (B, J, 1, 1)
        st = jnp.sin(t)[..., None, None]
        # K = [axis]_x, R = I + sin t K + (1 - cos t) K^2
        zeros = jnp.zeros((J,), jnp.float32)
        kx = jnp.stack(
            [
                zeros, -axes[:, 2], axes[:, 1],
                axes[:, 2], zeros, -axes[:, 0],
                -axes[:, 1], axes[:, 0], zeros,
            ],
            axis=-1,
        ).reshape(J, 3, 3)
        eye = jnp.eye(3, dtype=jnp.float32)
        R = eye + st * kx + (1.0 - ct) * (kx @ kx)  # (B, J, 3, 3)

        is_rev = jnp.asarray(
            [1.0 if ty == REVOLUTE else 0.0 for ty in self._types], jnp.float32
        )[:, None, None]
        is_pri = jnp.asarray(
            [1.0 if ty == PRISMATIC else 0.0 for ty in self._types], jnp.float32
        )[:, None]
        R = is_rev * R + (1.0 - is_rev) * eye
        trans = is_pri * axes * t[..., None]  # (B, J, 3)

        local = jnp.zeros((B, J, 4, 4), q.dtype)
        local = local.at[..., :3, :3].set(R)
        local = local.at[..., :3, 3].set(trans)
        local = local.at[..., 3, 3].set(1.0)
        return jnp.asarray(self._origins)[None] @ local

    def link_poses(self, q: Array) -> Array:
        """FK: joint vector (B, dof) -> all link poses (B, L, 4, 4) in base frame.

        Unrolled over the (static, short) topological order; each step is a
        batched 4x4 matmul, so XLA emits one fused static graph.
        """
        local = self._joint_local(q)  # (B, J, 4, 4)
        B = q.shape[0]
        poses = [jnp.broadcast_to(jnp.eye(4, dtype=q.dtype), (B, 4, 4))]
        for ji, parent in enumerate(self._parent_index):
            poses.append(poses[int(parent)] @ local[:, ji])
        return jnp.stack(poses, axis=1)

    def keypoint_poses(self, q: Array) -> Array:
        """Poses of the keypoint links only: (B, nkpt, 4, 4).

        Equivalent of URDFRobot.get_TWL (urdf_robot.py:124-135).
        """
        return self.link_poses(q)[:, self._kp_pose_index]

    # ------------------------------------------------------------------
    # keypoint APIs (reference parity)
    # ------------------------------------------------------------------

    def rot_to_matrix(self, rot: Array) -> Array:
        """Accept 6D / quat / 9D rotation parameterizations like the reference."""
        d = rot.shape[-1]
        if d == 6:
            return rot6d_to_rotmat(rot)
        if d == 4:
            return quat_to_rotmat(rot)
        if d == 9:
            return rot9d_to_rotmat(rot)
        raise NotImplementedError(f"rotation dim {d}")

    def _points_from_poses(self, TWL: Array) -> Array:
        """Apply per-keypoint offsets: (B, nkpt, 4, 4) -> (B, nkpt, 3)."""
        off = jnp.asarray(self.keypoint_offsets)  # (nkpt, 3)
        return (
            jnp.einsum("bkij,kj->bki", TWL[..., :3, :3], off) + TWL[..., :3, 3]
        )

    def keypoints_base(self, q: Array, rot: Array, trans: Array) -> Array:
        """Camera-frame keypoints when (rot, trans) is the BASE->camera pose.

        Ref parity: urdf_robot.py:95-122 `get_keypoints`.
        """
        base2cam = make_T(self.rot_to_matrix(rot), trans)  # (B, 4, 4)
        TWL = self.keypoint_poses(q)
        return self._points_from_poses(base2cam[:, None] @ TWL)

    def keypoints_root(
        self, q: Array, rot: Array, trans: Array, root: int = 0
    ) -> Array:
        """Camera-frame keypoints when (rot, trans) is keypoint-`root`->camera.

        Ref parity: urdf_robot.py:193-223 `get_keypoints_root` (re-roots the
        FK at keypoint `root` via TWL_root^-1 @ TWL before applying the pose).
        """
        if root == 0:
            return self.keypoints_base(q, rot, trans)
        base2cam = make_T(self.rot_to_matrix(rot), trans)
        TWL = self.keypoint_poses(q)
        TWL_root_inv = invert_T(TWL[:, root : root + 1])
        return self._points_from_poses(base2cam[:, None] @ TWL_root_inv @ TWL)

    def keypoints_fk_only(self, q: Array, root: int = 0) -> Array:
        """Base-frame (or root-frame) keypoints from joint angles alone.

        Ref parity: urdf_robot.py:165-190.
        """
        TWL = self.keypoint_poses(q)
        if root != 0:
            TWL = invert_T(TWL[:, root : root + 1]) @ TWL
        return self._points_from_poses(TWL)

    def rotation_at_root(
        self, q: Array, rot: Array, trans: Array, root: int = 0
    ) -> Array:
        """Re-express a base->camera rotation at keypoint `root`.

        Ref parity: urdf_robot.py:137-162.
        """
        if root == 0:
            return rot
        base2cam = make_T(self.rot_to_matrix(rot), trans)
        TWL = self.keypoint_poses(q)
        R = (base2cam[:, None] @ TWL)[:, root, :3, :3]
        d = rot.shape[-1]
        if d == 6:
            return rotmat_to_rot6d(R)
        if d == 4:
            return rotmat_to_quat(R)
        raise NotImplementedError(f"rotation dim {d}")

    def root_to_base_pose(self, q: Array, rot: Array, trans: Array, root: int) -> Array:
        """Convert a root-keypoint->camera pose into base->camera (B, 4, 4).

        Used by the renderer path (urdf_robot.py:293-309 does the inverse
        composition per sample on host; here it's batched on device).
        """
        root2cam = make_T(self.rot_to_matrix(rot), trans)
        if root == 0:
            return root2cam
        TWL = self.keypoint_poses(q)
        return root2cam @ invert_T(TWL[:, root])
