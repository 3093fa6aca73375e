"""RootNetwithRegInt — the flagship holistic pose network, flax.linen.

TPU re-design of the reference's lib/models/full_net.py (RootNetwithRegInt,
:17-466). One linen module with:

  * rootnet branch: hrnet32 (feat-only) or resnet trunk -> pooled feature
    -> gamma -> absolute root depth = gamma * k / 1000 (:276-342)
  * regression branch: resnet50 (+3 deconvs) or hrnet32 (dual-head) ->
    3D heatmaps -> fused integral decode -> pred_uvd / pred_xyz_int and
    root uv (:347-364), pooled feature xf
  * root translation from (root uv, depth) back-projection (:367)
  * JointNet: n_iter-unrolled residual MLP from mean pose (:376-394), or a
    joint-heatmap 1D-integral head when reg_joint_map (:91-97,376-379)
  * RotationNet: 6D rotation, iterative residual / iterative-matmul /
    direct 6-layer MLP variants (:396-444)
  * FK head: camera-frame keypoints from (pose, rot, trans) through the
    compiled kinematic chain, re-rooted at reference_keypoint_id (:447-450)

The iterative heads are unrolled at trace time (n_iter=4 static) and reuse
the same Dense parameters every iteration, exactly like the reference's
weight-shared loops. All timing instrumentation (`test_fps`) is external:
bench.py times the jitted function with block_until_ready, the TPU
equivalent of the reference's cuda-synchronized timers (:277-457).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.const import JOINT_BOUNDS, initial_joint_angles
from ..kinematics import KinematicChain, ROBOT_DOF, ROBOT_NKPT, load_robot
from ..utils.geometry import inv_K, rot6d_to_rotmat, rotmat_to_rot6d
from ..ops.subpixel import SubpixelConvTranspose
from ..utils.transforms import uvz_to_xyz_singlepoint
from .hrnet import HRNet
from .integral import integral_joint_decode, integral_pose_decode
from .resnet import ResNet, feature_channels


@dataclasses.dataclass(frozen=True)
class FullNetConfig:
    """Static architecture config (mirrors the reference's args fields)."""

    robot_type: str = "panda"
    backbone_name: str = "resnet50"
    rootnet_backbone_name: str = "hrnet32"
    image_size: int = 256
    n_iter: int = 4
    p_dropout: float = 0.5
    rotation_dim: int = 6
    direct_reg_rot: bool = False
    rot_iterative_matmul: bool = False
    reg_joint_map: bool = False
    joint_conv_dim: Sequence[int] = (256, 256, 256)
    fix_root: bool = True
    reference_keypoint_id: int = 3
    bbox_depth_mm: float = 1300.0  # bbox_3d_shape[2]
    multi_kp: bool = False
    kps_need_depth: Sequence[int] | None = None
    add_fc: bool = False
    deconv_dim: Sequence[int] = (256, 256, 256)

    @property
    def dof(self) -> int:
        return ROBOT_DOF[self.robot_type]

    @property
    def nkpt(self) -> int:
        return ROBOT_NKPT[self.robot_type]

    @property
    def depth_factor(self) -> float:
        return self.bbox_depth_mm * 1e-3


class FullNetOutput(dict):
    """Prediction bundle: dict with attribute access, registered as a pytree."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


jax.tree_util.register_pytree_node(
    FullNetOutput,
    lambda d: (tuple(d.values()), tuple(d.keys())),
    lambda keys, vals: FullNetOutput(zip(keys, vals)),
)


class RootNetwithRegInt(nn.Module):
    cfg: FullNetConfig
    dtype: Any = jnp.float32
    # inference-only: space-to-depth packed HRNet branches (~1.6x on the
    # hrnet trunk); requires variables converted by pack_full_net_variables
    packed_inference: bool = False
    # int8 serving path for the conv trunks (ops/quant.py): None | 'calib'
    # | 'int8'. Calibrate with qmode='calib' + mutable=['quant'], then
    # serve with qmode='int8' passing the recorded 'quant' collection.
    qmode: str | None = None
    # integral decode implementation: 'jnp' (autodiff path) or 'pallas'
    # (one-HBM-pass fused kernel, inference-only, TPU-only)
    decode_impl: str = "jnp"

    def _hrnet_cls(self):
        if self.packed_inference:
            from .hrnet_packed import HRNetPacked

            return HRNetPacked
        return HRNet

    def setup(self):
        c = self.cfg
        self.robot: KinematicChain = load_robot(c.robot_type)
        depth_dim = 64
        self.depth_dim = depth_dim
        self.hm_size = c.image_size // 4

        # --- rootnet branch -------------------------------------------------
        if c.rootnet_backbone_name in ("hrnet", "hrnet32"):
            self.rootnet_backbone = self._hrnet_cls()(
                32, c.nkpt, depth_dim, generate_hm=False, generate_feat=True,
                dtype=self.dtype, qmode=self.qmode, name="rootnet_backbone",
            )
            self.root_feat_ch = 2048
        else:
            self.rootnet_backbone = ResNet(
                c.rootnet_backbone_name, self.dtype, qmode=self.qmode,
                name="rootnet_backbone",
            )
            self.root_feat_ch = feature_channels(c.rootnet_backbone_name)
        self.depth_num = len(c.kps_need_depth) if c.multi_kp else 1
        # tiny init (ref full_net.py:185-188 normal std=0.001, zero bias):
        # keeps the untrained depth near 0 m instead of +-(k/1000)-scale
        # garbage that throws FK keypoints far behind the camera
        self.depth_layer = nn.Dense(
            self.depth_num, dtype=self.dtype, name="depth_layer",
            kernel_init=nn.initializers.normal(stddev=0.001),
        )
        if c.add_fc:
            self.depth_fc_d1 = nn.Dense(1024, dtype=self.dtype)
            self.depth_fc_d2 = nn.Dense(512, dtype=self.dtype)
            self.depth_bn = nn.BatchNorm(momentum=0.9, dtype=jnp.float32)
            self.depth_fc_u2 = nn.Dense(1024, dtype=self.dtype)
            self.depth_fc_u1 = nn.Dense(self.root_feat_ch, dtype=self.dtype)

        # --- regression branch ---------------------------------------------
        if c.backbone_name in ("hrnet", "hrnet32"):
            self.reg_backbone = self._hrnet_cls()(
                32, c.nkpt, depth_dim, generate_hm=True, generate_feat=True,
                dtype=self.dtype, qmode=self.qmode, name="reg_backbone",
            )
            self.feature_channel = 2048
        else:
            self.reg_backbone = ResNet(
                c.backbone_name, self.dtype, qmode=self.qmode, name="reg_backbone"
            )
            self.feature_channel = feature_channels(c.backbone_name)
            self.deconvs = [
                (
                    # torch ConvTranspose2d(k=4, s=2, p=1) == flax 'SAME';
                    # subpixel form = exact same map at 1/4 the FLOPs
                    SubpixelConvTranspose(ch, dtype=self.dtype, name=f"deconv{i}"),
                    nn.BatchNorm(momentum=0.9, dtype=jnp.float32, name=f"deconv_bn{i}"),
                )
                for i, ch in enumerate(c.deconv_dim)
            ]
            self.final_layer = nn.Conv(
                c.nkpt * depth_dim, (1, 1), dtype=self.dtype, name="final_layer"
            )

        # --- JointNet -------------------------------------------------------
        if c.reg_joint_map:
            self.joint_convs = [
                (
                    nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name=f"joint_conv{i}"),
                    nn.BatchNorm(momentum=0.9, dtype=jnp.float32, name=f"joint_bn{i}"),
                )
                for i, ch in enumerate(c.joint_conv_dim)
            ]
            self.joint_final = nn.Conv(c.dof, (1, 1), dtype=self.dtype, name="joint_final")
        else:
            self.fc_pose_1 = nn.Dense(1024, dtype=self.dtype)
            self.fc_pose_2 = nn.Dense(1024, dtype=self.dtype)
            self.decpose = nn.Dense(
                c.dof, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform() if False else
                nn.initializers.variance_scaling(0.01 ** 2 * 3, "fan_avg", "uniform"),
            )

        # --- RotationNet ----------------------------------------------------
        small_init = nn.initializers.variance_scaling(0.01 ** 2 * 3, "fan_avg", "uniform")
        if c.direct_reg_rot:
            self.fc_rot = [nn.Dense(1024, dtype=self.dtype, name=f"fc_rot_{i+1}") for i in range(6)]
            self.decrot = nn.Dense(6, dtype=self.dtype, kernel_init=small_init)
        else:
            self.fc_rot_1 = nn.Dense(1024, dtype=self.dtype)
            self.fc_rot_2 = nn.Dense(1024, dtype=self.dtype)
            self.decrot = nn.Dense(c.rotation_dim, dtype=self.dtype, kernel_init=small_init)

        self.drop1 = nn.Dropout(c.p_dropout)
        self.drop2 = nn.Dropout(c.p_dropout)

        # init pose / rot "buffers" (non-trainable constants, ref :190-212)
        self.init_pose_const = jnp.asarray(
            initial_joint_angles(c.robot_type, "mean"), jnp.float32
        )
        init_R = jnp.eye(3)[None]
        self.init_rot_const = (
            rotmat_to_rot6d(init_R)[0]
            if c.rotation_dim == 6
            else jnp.asarray([1.0, 0, 0, 0])
        )

    # -----------------------------------------------------------------
    def _root_depth(self, x_root, k_value, train):
        c = self.cfg
        if c.rootnet_backbone_name in ("hrnet", "hrnet32"):
            feat = self.rootnet_backbone(x_root, train)
        else:
            fm = self.rootnet_backbone(x_root, train)
            feat = jnp.mean(fm, axis=(1, 2))
        if c.add_fc:
            f1 = self.depth_fc_d1(feat)
            f2 = self.depth_fc_d2(f1)
            mid = nn.leaky_relu(self.depth_bn(f2, use_running_average=not train))
            f3 = 0.5 * (self.depth_fc_u2(mid) + f1)
            feat = 0.5 * (self.depth_fc_u1(f3) + feat)
        gamma = self.depth_layer(feat)  # (B, depth_num)
        depths_mm = gamma * k_value.reshape(-1, 1)
        depths = depths_mm / 1000.0  # meters
        if c.multi_kp:
            root_index = list(c.kps_need_depth).index(c.reference_keypoint_id)
            return depths[:, root_index : root_index + 1], depths
        return depths[:, :1], None

    def _reg_branch(self, x_reg, train):
        c = self.cfg
        if c.backbone_name in ("hrnet", "hrnet32"):
            hm, xf = self.reg_backbone(x_reg, train)
            return hm, xf, None
        fm = self.reg_backbone(x_reg, train)
        xf = jnp.mean(fm, axis=(1, 2))  # GAP == AvgPool(image/32) (ref :82)
        y = fm
        for deconv, bn in self.deconvs:
            y = nn.relu(bn(deconv(y), use_running_average=not train))
        hm = self.final_layer(y)
        return hm, xf, fm

    def _joint_head(self, xf, fm, train):
        c = self.cfg
        if c.reg_joint_map:
            y = fm
            for conv, bn in self.joint_convs:
                y = nn.relu(bn(conv(y), use_running_average=not train))
            y = self.joint_final(y)
            bounds = jnp.asarray(JOINT_BOUNDS[c.robot_type])
            return integral_joint_decode(y, bounds)
        pose = jnp.broadcast_to(self.init_pose_const, (xf.shape[0], c.dof))
        for _ in range(c.n_iter):
            xc = jnp.concatenate([xf, pose], axis=-1)
            xc = self.drop1(self.fc_pose_1(xc), deterministic=not train)
            xc = self.drop2(self.fc_pose_2(xc), deterministic=not train)
            pose = self.decpose(xc) + pose
        return pose

    def _rot_head(self, xf, train):
        c = self.cfg
        if c.direct_reg_rot:
            xc1 = self.fc_rot[0](xf)
            y = xc1
            for layer in self.fc_rot[1:]:
                y = layer(y)
            return self.decrot(y + xc1)
        rot = jnp.broadcast_to(self.init_rot_const, (xf.shape[0], c.rotation_dim))
        for _ in range(c.n_iter):
            xc = jnp.concatenate([xf, rot], axis=-1)
            xc = self.drop1(self.fc_rot_1(xc), deterministic=not train)
            xc = self.drop2(self.fc_rot_2(xc), deterministic=not train)
            if c.rot_iterative_matmul:
                rot = rotmat_to_rot6d(
                    rot6d_to_rotmat(self.decrot(xc)) @ rot6d_to_rotmat(rot)
                )
            else:
                rot = self.decrot(xc) + rot
        return rot

    # -----------------------------------------------------------------
    def __call__(self, x_reg, x_root, k_value, K, train: bool = False):
        """x_reg/x_root: NHWC float images in [0, 1]; K: (B, 3, 3).

        Returns a FullNetOutput with fields pose, rot, trans, root_uv,
        depth, (depths if multi_kp), uvd, xyz_int, xyz_fk — the same
        quantities as the reference forward (:459-466).
        """
        c = self.cfg
        x_reg = x_reg.astype(self.dtype)
        x_root = x_root.astype(self.dtype)

        pred_depth, pred_depths = self._root_depth(x_root, k_value, train)

        hm, xf, fm = self._reg_branch(x_reg, train)
        invk = inv_K(K)
        root_trans3 = jnp.concatenate(
            [jnp.zeros_like(pred_depth), jnp.zeros_like(pred_depth), pred_depth],
            axis=-1,
        )
        pred_uvd, pred_xyz_int = integral_pose_decode(
            hm,  # bf16 reads OK — decode accumulates in f32 internally
            c.nkpt, self.depth_dim, self.hm_size, self.hm_size,
            K, invk, root_trans3, float(c.image_size), c.depth_factor,
            rootid=c.reference_keypoint_id, fixroot=c.fix_root,
            decode_impl=(self.decode_impl if not train else "jnp"),
        )
        pred_root_uv = (pred_uvd[:, c.reference_keypoint_id, :2] + 0.5) * c.image_size

        pred_trans = uvz_to_xyz_singlepoint(pred_root_uv, pred_depth, K)

        xf = xf.astype(jnp.float32)
        pred_pose = self._joint_head(xf, fm, train)
        pred_rot = self._rot_head(xf, train)

        if c.reference_keypoint_id == 0:
            pred_xyz_fk = self.robot.keypoints_base(pred_pose, pred_rot, pred_trans)
        else:
            pred_xyz_fk = self.robot.keypoints_root(
                pred_pose, pred_rot, pred_trans, root=c.reference_keypoint_id
            )

        out = FullNetOutput(
            pose=pred_pose,
            rot=pred_rot,
            trans=pred_trans,
            root_uv=pred_root_uv,
            depth=pred_depth,
            uvd=pred_uvd,
            xyz_int=pred_xyz_int,
            xyz_fk=pred_xyz_fk,
        )
        if c.multi_kp:
            out["depths"] = pred_depths
        return out


def build_full_net(
    cfg: FullNetConfig, dtype=jnp.float32, packed_inference: bool = False,
    qmode: str | None = None, decode_impl: str = "jnp",
) -> RootNetwithRegInt:
    """Constructor mirroring get_rootNetwithRegInt_model (full_net.py:470-505).

    Pretrained-rootnet chaining (the torch `backbone -> rootnet_backbone`
    key remap, :487-500) is handled by hrpe_tpu.utils.checkpoint_io when
    importing torch checkpoints. `packed_inference=True` builds the
    serving twin with space-to-depth packed HRNet branches; convert
    trained variables with `pack_full_net_variables`.
    """
    return RootNetwithRegInt(cfg, dtype, packed_inference, qmode, decode_impl)


def pack_full_net_variables(variables: dict) -> dict:
    """Convert trained full-net variables for the packed-inference twin.

    Repacks every HRNet narrow-branch block found anywhere in the tree
    (rootnet_backbone and/or reg_backbone); resnet subtrees pass through.
    """
    from .hrnet_packed import pack_hrnet_variables

    return pack_hrnet_variables(variables, width=32)
