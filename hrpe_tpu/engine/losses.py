"""Loss computation for all three training pipelines, as pure functions.

The reference computes losses in `farward_loss` (lib/core/function.py:20-374)
with per-batch Python loops for GT assembly and k-values, host round-trips
for BPnP, and `.cuda()` scattered through. Here the data pipeline emits
fixed-shape arrays (GT already assembled and ordered) and everything below
is jit-safe device math; the whole train step — including FK and, for real
data, the JAX PnP — compiles into one XLA program.

Ref parity notes per loss: see inline citations. The k-value formula
(function.py:98-110, duplicated 5x across the reference) is one function.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..data.const import JOINT_TO_KP, initial_joint_angles
from ..utils.geometry import (
    geodesic_distance,
    project_points,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_quat,
    rotmat_to_rot6d,
)

Array = jax.Array

REAL_BBOX_MM = 1000.0  # ref function.py:98 `real_bbox`


def k_values(bboxes: Array, K: Array) -> Array:
    """Depth scale k = sqrt(fx*fy*1000*1000 / area), area = max-side^2.

    Ref parity: function.py:98-110 (and its 4 duplicates).
    bboxes: (B, 4) x1,y1,x2,y2; K: (B, 3, 3) of the SAME view as bboxes.
    """
    fx = K[:, 0, 0]
    fy = K[:, 1, 1]
    side = jnp.maximum(
        jnp.abs(bboxes[:, 2] - bboxes[:, 0]), jnp.abs(bboxes[:, 3] - bboxes[:, 1])
    )
    area = jnp.maximum(side * side, 1e-6)
    return jnp.sqrt(fx * fy * REAL_BBOX_MM * REAL_BBOX_MM / area)


def _elementwise(kind: str, pred: Array, gt: Array) -> Array:
    d = pred - gt
    if kind == "mse":
        return jnp.mean(d * d)
    if kind == "l1":
        return jnp.mean(jnp.abs(d))
    if kind == "smoothl1":
        a = jnp.abs(d)
        return jnp.mean(jnp.where(a < 1.0, 0.5 * d * d, a - 0.5))
    raise NotImplementedError(kind)


def safe_norm(d: Array, axis: int = -1) -> Array:
    """L2 norm whose gradient at 0 is 0, matching torch.linalg.vector_norm.

    jnp.linalg.norm has a NaN gradient at exactly 0. That is not academic
    here: with fix_root, xyz_int[:, ref] and xyz_fk[:, ref] BOTH equal
    pred_trans by construction, so the align loss takes the norm of pure
    fp noise that intermittently rounds to exactly 0 — this NaN'd the
    gradients of ~60% of round-3 training steps (the reference never hits
    it because torch defines the norm subgradient at 0 as 0).
    """
    s = jnp.sum(d * d, axis=axis)
    nz = s > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, s, 1.0)), 0.0)


def masked_norm_loss(pred: Array, gt: Array, mask: Array, axis: int = -1) -> Array:
    """sum(||pred-gt|| * mask) / count(mask != 0) (ref l2norm+mask pattern)."""
    err = safe_norm(pred - gt, axis=axis)
    denom = jnp.maximum(jnp.sum(mask != 0), 1)
    return jnp.sum(err * mask) / denom


def select_gt_rot(TCO: Array, rotation_dim: int) -> Array:
    R = TCO[:, :3, :3]
    if rotation_dim == 6:
        return rotmat_to_rot6d(R)
    if rotation_dim == 4:
        return rotmat_to_quat(R)
    raise NotImplementedError(rotation_dim)


def rot_to_mat(rot: Array) -> Array:
    return rot6d_to_rotmat(rot) if rot.shape[-1] == 6 else quat_to_rotmat(rot)


def full_net_losses(
    cfg,
    out: Dict[str, Array],
    batch: Dict[str, Any],
    gt_rot: Array,
    gt_pose: Array,
) -> tuple[Array, Dict[str, Array]]:
    """All ten weighted losses of the full-network pipeline.

    Ref parity: function.py:200-369. `out` is the FullNetOutput dict;
    `gt_rot` is either the dataset TCO rotation (synth) or the PnP-refined
    rotation (real, ref :75-83) — the caller decides.
    """
    image_size = float(cfg.image_size)
    other_K = batch["other_K"]
    gt_trans = batch["TCO"][:, :3, 3]
    gt_root_depth = gt_trans[:, 2:3]
    gt_kp2d = batch["other_keypoints_2d"]
    gt_kp3d = batch["other_keypoints_3d"]
    valid_crop = batch["other_valid_mask_crop"]
    ref_id = cfg.reference_keypoint_id
    gt_root_uv = gt_kp2d[:, ref_id, :2]

    pred_pose = out["pose"]
    if cfg.joint_individual_weights is not None:
        w = jnp.asarray(cfg.joint_individual_weights, jnp.float32)[None]
        pred_pose = pred_pose * w
        gt_pose = gt_pose * w
    if cfg.known_joint:
        pred_pose = gt_pose

    loss_pose = _elementwise(cfg.pose_loss_func, pred_pose, gt_pose)

    if cfg.rot_loss_func == "mat_mse":
        loss_rot = _elementwise("mse", rot6d_to_rotmat(out["rot"]), rot6d_to_rotmat(gt_rot))
    else:
        loss_rot = _elementwise(cfg.rot_loss_func, out["rot"], gt_rot)

    loss_depth = _elementwise(cfg.depth_loss_func, out["depth"], gt_root_depth)

    # uv loss (ref :256-271): l2norm variant is masked by the ref keypoint's
    # crop validity
    if cfg.uv_loss_func == "l2norm":
        err = safe_norm((out["root_uv"] - gt_root_uv) / image_size, axis=-1)
        m = valid_crop[:, ref_id]
        loss_uv = jnp.sum(err * m) / jnp.maximum(jnp.sum(m != 0), 1)
    else:
        loss_uv = _elementwise(
            cfg.uv_loss_func, out["root_uv"] / image_size, gt_root_uv / image_size
        )

    # trans loss (ref :273-292): l2norm with exp(-20*err) damping when the
    # batch mean exceeds 0.5 m — a data-dependent scalar branch, expressed
    # as jnp.where so it stays one compiled graph
    if cfg.trans_loss_func == "l2norm":
        err = safe_norm(out["trans"] - gt_trans, axis=-1)
        plain = jnp.mean(err)
        damped = jnp.mean(err * jax.lax.stop_gradient(jnp.exp(-20.0 * err)))
        loss_trans = jnp.where(plain > 0.5, damped, plain)
    else:
        loss_trans = _elementwise(cfg.trans_loss_func, out["trans"], gt_trans)

    # FK keypoint losses (ref :294-311)
    loss_kp3d = jnp.mean(safe_norm(out["xyz_fk"] - gt_kp3d, axis=-1))
    kp2d_fk = project_points(other_K, out["xyz_fk"]) / image_size
    gt_kp2d_n = gt_kp2d / image_size
    loss_kp2d = masked_norm_loss(kp2d_fk, gt_kp2d_n, valid_crop)

    # integral keypoint losses (ref :313-332)
    err3d_int = safe_norm(out["xyz_int"] - gt_kp3d, axis=-1)
    if cfg.fix_mask:
        loss_kp3d_int = jnp.sum(err3d_int * valid_crop) / jnp.maximum(
            jnp.sum(valid_crop != 0), 1
        )
    else:
        loss_kp3d_int = jnp.mean(err3d_int)
    kp2d_int = project_points(other_K, out["xyz_int"]) / image_size
    loss_kp2d_int = masked_norm_loss(kp2d_int, gt_kp2d_n, valid_crop)

    # FK-vs-integral alignment (ref :334-343)
    align = safe_norm(out["xyz_fk"] - out["xyz_int"], axis=-1)
    if cfg.fix_mask:
        loss_align = jnp.sum(align * valid_crop) / jnp.maximum(
            jnp.sum(valid_crop != 0), 1
        )
    else:
        loss_align = jnp.mean(align)

    total = (
        cfg.pose_loss_weight * loss_pose
        + cfg.rot_loss_weight * loss_rot
        + cfg.uv_loss_weight * loss_uv
        + cfg.depth_loss_weight * loss_depth
        + cfg.trans_loss_weight * loss_trans
        + cfg.kp2d_loss_weight * loss_kp2d
        + cfg.kp3d_loss_weight * loss_kp3d
        + cfg.kp2d_int_loss_weight * loss_kp2d_int
        + cfg.kp3d_int_loss_weight * loss_kp3d_int
        + cfg.align_3d_loss_weight * loss_align
    )

    if cfg.multi_kp:
        gt_kp_depths = gt_kp3d[:, jnp.asarray(list(cfg.kps_need_depth)), 2]
        loss_multi = jnp.mean(jnp.abs(out["depths"] - gt_kp_depths))
        total = total + loss_multi

    loss_dict = {
        "loss_joint": loss_pose,
        "loss_rot": loss_rot,
        "loss_uv": loss_uv,
        "loss_depth": loss_depth,
        "loss_trans": loss_trans,
        "loss_error2d": loss_kp2d,
        "loss_error3d": loss_kp3d,
        "loss_error2d_int": loss_kp2d_int,
        "loss_error3d_int": loss_kp3d_int,
        "loss_error3d_align": loss_align,
    }
    return total, loss_dict


def apply_joint_valid_mask(cfg, gt_pose: Array, valid_mask: Array) -> Array:
    """Replace GT angles of invisible joints with the mean pose.

    Ref parity: function.py:119-130.
    """
    j2k = jnp.asarray(JOINT_TO_KP[cfg.urdf_robot_name])
    joint_valid = valid_mask[:, j2k]
    mean_pose = jnp.asarray(initial_joint_angles(cfg.urdf_robot_name, "mean"))[None]
    return gt_pose * joint_valid + mean_pose * (1.0 - joint_valid)


def depthnet_loss(cfg, pred_depth: Array, gt_depth: Array,
                  pred_xy: Array | None = None, gt_xy: Array | None = None,
                  xy_mask: Array | None = None):
    """DepthNet pipeline loss (ref train_depthnet.py:285-306).

    With the xy branch enabled the reference ADDS an L1/MSE term between
    the soft-argmax coords and the root keypoint's camera-frame xy,
    masked by the root-view in-frame validity of the reference keypoint
    (train_depthnet.py:285,293-299).
    """
    loss = _elementwise(cfg.depth_loss_func, pred_depth, gt_depth)
    out = {"loss_depth": loss}
    total = cfg.rootnet_depth_loss_weight * loss
    if pred_xy is not None:
        loss_xy = _elementwise(cfg.xy_loss_func, pred_xy * xy_mask, gt_xy * xy_mask)
        out["loss_xy"] = loss_xy
        total = total + loss_xy
    return total, out


def rotation_diff_metric(pred_rot: Array, gt_rot: Array) -> Array:
    """Mean geodesic rotation error (ref function.py:188-191)."""
    return jnp.mean(geodesic_distance(rot_to_mat(pred_rot), rot_to_mat(gt_rot)))
