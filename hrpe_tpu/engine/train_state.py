"""Functional training state + step builders for all three pipelines.

The reference has three copy-pasted training loops (train_full.py /
train_depthnet.py / train_sim2real.py, ~70% duplicated — SURVEY.md §7.0).
Here there is ONE functional core: `state = step(state, batch, rng)`,
jitted once and sharded over the data mesh; the three pipelines are three
loss configurations of the same engine. BatchNorm running stats live in
the state and update per-device (no cross-replica sync — matching the
reference's per-replica BN under DDP, SURVEY.md §7.2 item 6).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..utils.geometry import rotmat_to_quat, rotmat_to_rot6d
from . import losses as L

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(model, tx, rng, example_inputs) -> TrainState:
    variables = model.init(rng, *example_inputs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Per-epoch LR injection (torch LambdaLR equivalent)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


# ---------------------------------------------------------------------------
# shared GT assembly (device-side; the reference does this in Python loops
# per batch, function.py:54-110)
# ---------------------------------------------------------------------------

def assemble_gt(cfg, batch: Dict[str, Array], robot, use_pnp: bool):
    """Returns (gt_pose_masked, gt_pose_raw, gt_rot, k_vals)."""
    gt_pose = batch["jointpose"]
    gt_pose_raw = gt_pose
    if cfg.use_joint_valid_mask:
        gt_pose = L.apply_joint_valid_mask(cfg, gt_pose, batch["valid_mask"])

    if use_pnp:
        # real data: refit GT rotation by PnP on GT 2D keypoints
        # (ref function.py:75-83) — pure-JAX PnP, stays inside the step
        from ..pnp import pnp_pose

        world_pts = robot.keypoints_fk_only(gt_pose)
        rvec_t = pnp_pose(
            batch["keypoints_2d_original"], world_pts, batch["K_original"]
        )
        from ..utils.geometry import axis_angle_to_rotmat

        R = axis_angle_to_rotmat(rvec_t[:, :3])
        gt_rot = rotmat_to_rot6d(R) if cfg.rotation_dim == 6 else rotmat_to_quat(R)
    else:
        gt_rot = L.select_gt_rot(batch["TCO"], cfg.rotation_dim)

    # bbox choice for k-values (ref function.py:48-53,99-110)
    if cfg.use_extended_bbox:
        bboxes, K = batch["root_bbox_gt2d_extended"], batch["root_K"]
    elif cfg.use_origin_bbox:
        bboxes, K = batch["bbox_strict_bounded_original"], batch["K_original"]
    else:
        bboxes, K = batch["root_bbox_strict_bounded"], batch["root_K"]
    k_vals = L.k_values(bboxes, K)
    return gt_pose, gt_pose_raw, gt_rot, k_vals


# ---------------------------------------------------------------------------
# full-network pipeline
# ---------------------------------------------------------------------------

def make_full_net_step(cfg, model, tx, robot, use_pnp: bool) -> Callable:
    """One fused train step: GT assembly + forward + 10 losses + adam update."""

    def loss_fn(params, batch_stats, batch, rng):
        gt_pose, _, gt_rot, k_vals = assemble_gt(cfg, batch, robot, use_pnp)
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables,
            batch["other_images"].astype(jnp.float32) / 255.0,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            batch["other_K"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        total, loss_dict = L.full_net_losses(cfg, out, batch, gt_rot, gt_pose)
        return total, (loss_dict, mutated["batch_stats"])

    @jax.jit
    def step(state: TrainState, batch, rng):
        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        loss_dict["loss"] = total
        return new_state, loss_dict

    return step


def make_full_net_eval(cfg, model, robot, use_pnp: bool, extra_vars=None) -> Callable:
    """Eval step: forward + losses + metric tensors (ref validate loop).

    extra_vars: optional additional variable collections merged into the
    state's (e.g. the calibrated 'quant' collection when evaluating a
    quantized serving twin — scripts/test.py --qmode)."""
    from .metrics import compute_metrics_batch

    @jax.jit
    def evaluate(state: TrainState, batch):
        gt_pose, gt_pose_raw, gt_rot, k_vals = assemble_gt(cfg, batch, robot, use_pnp)
        out = model.apply(
            {**state.variables, **(extra_vars or {})},
            batch["other_images"].astype(jnp.float32) / 255.0,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            batch["other_K"],
            train=False,
        )
        total, loss_dict = L.full_net_losses(cfg, out, batch, gt_rot, gt_pose)
        loss_dict["loss"] = total
        m_fk = compute_metrics_batch(
            robot,
            batch["other_keypoints_3d"],
            batch["keypoints_2d_original"],
            batch["K_original"],
            gt_pose_raw,
            out["xyz_fk"],
            pred_joint=out["pose"],
            reference_keypoint_id=cfg.reference_keypoint_id,
        )
        m_int = compute_metrics_batch(
            robot,
            batch["other_keypoints_3d"],
            batch["keypoints_2d_original"],
            batch["K_original"],
            gt_pose_raw,
            out["xyz_int"],
            pred_joint=None,
            reference_keypoint_id=cfg.reference_keypoint_id,
        )
        loss_dict["rotation_diff"] = L.rotation_diff_metric(out["rot"], gt_rot)
        # mean per-axis euler-angle error (ref scripts/test.py:182-192)
        from ..utils.geometry import euler_from_rotmat

        eul_p = euler_from_rotmat(L.rot_to_mat(out["rot"]))
        eul_g = euler_from_rotmat(L.rot_to_mat(gt_rot))
        d = jnp.abs(eul_p - eul_g)
        d = jnp.minimum(d, 2 * jnp.pi - d)  # wrap-around
        loss_dict["euler_err"] = jnp.mean(d)
        # integral-keypoint 2D reprojection error inside the crop, masked
        # by in-crop validity (ref scripts/test.py:182-192)
        from ..utils.geometry import project_points

        kp2d_int = project_points(batch["other_K"], out["xyz_int"])
        vm = batch["other_valid_mask_crop"]
        e2d = jnp.linalg.norm(
            kp2d_int - batch["other_keypoints_2d"], axis=-1
        ) * vm
        loss_dict["kp2d_int_distance"] = jnp.sum(e2d) / jnp.maximum(
            jnp.sum(vm), 1.0
        )
        return loss_dict, m_fk, m_int, out

    return evaluate


# ---------------------------------------------------------------------------
# depthnet pipeline
# ---------------------------------------------------------------------------

def _depthnet_gt(cfg, batch):
    """GT root translation/depth: robot base (TCO) when
    reference_keypoint_id == 0, else the reference keypoint's camera-frame
    position (ref train_depthnet.py:231-237)."""
    if cfg.reference_keypoint_id == 0:
        gt_trans = batch["TCO"][:, :3, 3]
    else:
        gt_trans = batch["root_keypoints_3d"][:, cfg.reference_keypoint_id]
    return gt_trans, gt_trans[:, 2:3]


def make_depthnet_step(cfg, model, tx) -> Callable:
    def loss_fn(params, batch_stats, batch, rng):
        if cfg.use_extended_bbox:
            bboxes, K = batch["root_bbox_gt2d_extended"], batch["root_K"]
        elif cfg.use_origin_bbox:
            bboxes, K = batch["bbox_strict_bounded_original"], batch["K_original"]
        else:
            bboxes, K = batch["root_bbox_strict_bounded"], batch["root_K"]
        k_vals = L.k_values(bboxes, K)
        gt_trans, gt_depth = _depthnet_gt(cfg, batch)
        variables = {"params": params, "batch_stats": batch_stats}
        pred, mutated = model.apply(
            variables,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        pred_depth = pred[:, -1:] / 1000.0  # mm -> m
        if cfg.use_rootnet_xy_branch:
            mask = batch["root_valid_mask_crop"][:, cfg.reference_keypoint_id]
            total, loss_dict = L.depthnet_loss(
                cfg, pred_depth, gt_depth,
                pred_xy=pred[:, 0:2], gt_xy=gt_trans[:, 0:2],
                xy_mask=mask[:, None],
            )
        else:
            total, loss_dict = L.depthnet_loss(cfg, pred_depth, gt_depth)
        return total, (loss_dict, mutated["batch_stats"])

    @jax.jit
    def step(state: TrainState, batch, rng):
        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        loss_dict["loss"] = total
        return (
            state.replace(
                params=new_params, batch_stats=new_stats,
                opt_state=new_opt, step=state.step + 1,
            ),
            loss_dict,
        )

    return step


def make_depthnet_eval(cfg, model) -> Callable:
    @jax.jit
    def evaluate(state: TrainState, batch):
        if cfg.use_extended_bbox:
            bboxes, K = batch["root_bbox_gt2d_extended"], batch["root_K"]
        elif cfg.use_origin_bbox:
            bboxes, K = batch["bbox_strict_bounded_original"], batch["K_original"]
        else:
            bboxes, K = batch["root_bbox_strict_bounded"], batch["root_K"]
        k_vals = L.k_values(bboxes, K)
        _, gt_depth = _depthnet_gt(cfg, batch)
        pred = model.apply(
            state.variables,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            train=False,
        )
        pred_depth = pred[:, -1:] / 1000.0
        total, loss_dict = L.depthnet_loss(cfg, pred_depth, gt_depth)
        loss_dict["loss"] = total
        loss_dict["depth_abs_err"] = jnp.abs(pred_depth - gt_depth)[:, 0]
        return loss_dict

    return evaluate
