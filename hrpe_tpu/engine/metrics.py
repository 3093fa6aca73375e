"""Evaluation metrics: ADD / PCK / AUC / per-joint errors.

Device part (`compute_metrics_batch`) is pure jnp and returns fixed-shape
arrays from inside the jitted eval step; host part (`summary_add_pck`)
aggregates numpy distances into the AUC summaries. Semantics match the
reference (lib/utils/metrics.py:8-162): ADD AUC integrates the fraction of
images with mean-keypoint 3D error under t for t in [0, 0.1 m) at 1e-5
steps; PCK AUC uses 2D pixel error in [0, 20 px) at 0.01 steps — but the
threshold sweep is vectorized (one broadcast compare, not a 10^4-iteration
Python loop).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import project_points

Array = jax.Array

ADD_THRESHOLDS_MM = [1, 5, 10, 20, 40, 60, 80, 100]
PCK_THRESHOLDS_PX = [2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 17.5, 20.0]


def compute_metrics_batch(
    robot,
    gt_keypoints3d: Array,
    gt_keypoints2d_original: Array,
    K_original: Array,
    gt_joint: Array,
    pred_keypoints3d: Array,
    pred_joint: Optional[Array] = None,
    reference_keypoint_id: int = 0,
    frame_wh=(640.0, 480.0),
) -> Dict[str, Array]:
    """Per-batch error tensors (jit-safe).

    `pred_keypoints3d` is either the FK keypoints or the integral keypoints
    (the reference's two calls, function.py:158-187, share this body).

    Ref parity: metrics.py:8-114 — including the 2D validity mask against
    the original 640x480 frame and the panda convention of excluding the
    finger joint from the per-image joint error (metrics.py:84-87).
    """
    pred2d = project_points(K_original, pred_keypoints3d)
    err3d = jnp.linalg.norm(pred_keypoints3d - gt_keypoints3d, axis=-1)  # (B, K)
    image_dis3d = jnp.mean(err3d, axis=1)  # (B,)
    dis3d_per_kp = jnp.mean(err3d, axis=0)  # (K,)

    err2d = jnp.linalg.norm(pred2d - gt_keypoints2d_original, axis=-1)
    valid = (
        (gt_keypoints2d_original[..., 0] <= frame_wh[0])
        & (gt_keypoints2d_original[..., 0] >= 0)
        & (gt_keypoints2d_original[..., 1] <= frame_wh[1])
        & (gt_keypoints2d_original[..., 1] >= 0)
    ).astype(err2d.dtype)
    err2d_masked = err2d * valid
    image_dis2d = jnp.sum(err2d_masked, axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1.0
    )
    dis2d_per_kp = jnp.sum(err2d_masked, axis=0) / jnp.maximum(
        jnp.sum(valid, axis=0), 1.0
    )

    out = {
        "image_dis3d": image_dis3d,
        "image_dis2d": image_dis2d,
        "dis3d_per_kp": dis3d_per_kp,
        "dis2d_per_kp": dis2d_per_kp,
    }

    if pred_joint is not None:
        err_j = jnp.abs(gt_joint - pred_joint)  # (B, dof)
        out["l1_joint_per_joint"] = jnp.mean(err_j, axis=0)
        if robot is not None and robot.name == "panda":
            out["image_joint_err"] = jnp.mean(err_j[:, :-1], axis=1)
        else:
            out["image_joint_err"] = jnp.mean(err_j, axis=1)

    # root depth error + root-relative errors (ref metrics.py:93-110)
    rid = reference_keypoint_id
    out["depth_err"] = jnp.abs(
        pred_keypoints3d[:, rid, 2] - gt_keypoints3d[:, rid, 2]
    )
    pred_rel = pred_keypoints3d[..., 2] - pred_keypoints3d[:, rid : rid + 1, 2]
    gt_rel = gt_keypoints3d[..., 2] - gt_keypoints3d[:, rid : rid + 1, 2]
    out["image_rel_err"] = jnp.mean(jnp.abs(pred_rel - gt_rel), axis=1)
    # root-relative ADD: z replaced by root-relative depth on both sides
    # (ref metrics.py:103-110; feeds the Relative_ADD/AUC summary line)
    pr = pred_keypoints3d.at[..., 2].set(pred_rel)
    gr = gt_keypoints3d.at[..., 2].set(gt_rel)
    out["image_dis3d_rel"] = jnp.mean(jnp.linalg.norm(pr - gr, axis=-1), axis=1)
    return out


def auc(values: np.ndarray, max_threshold: float, step: float) -> float:
    """AUC of the fraction-under-threshold curve (vectorized trapezoid).

    Matches np.trapz over np.arange(0, max, step) of mean(values <= t)
    (ref metrics.py:127-148) to float64 accuracy.
    """
    values = np.asarray(values, np.float64)
    ts = np.arange(0.0, max_threshold, step)
    frac = (values[None, :] <= ts[:, None]).mean(axis=1)
    return float(np.trapezoid(frac, dx=step) / max_threshold)


def summary_add_pck(dis3d: np.ndarray, dis2d: np.ndarray) -> Dict[str, float]:
    """Summary table (ref metrics.py:117-162)."""
    dis3d = np.asarray(dis3d)
    dis2d = np.asarray(dis2d)
    summary = {
        "ADD/mean": float(np.mean(dis3d)),
        "ADD/median": float(np.median(dis3d)),
        "ADD/AUC": auc(dis3d, 0.1, 1e-5),
        "ADD_2D/mean": float(np.mean(dis2d)),
        "ADD_2D/median": float(np.median(dis2d)),
        "PCK/AUC": auc(dis2d, 20.0, 0.01),
    }
    for t in ADD_THRESHOLDS_MM:
        summary[f"ADD_{t}_mm"] = float(np.mean(dis3d <= t * 1e-3))
    for t in PCK_THRESHOLDS_PX:
        summary[f"PCK_{t}_pixel"] = float(np.mean(dis2d <= t))
    return summary


def draw_depth_figure(depth_errors, gt_depths, save_path, title=""):
    """Root-depth-error vs gt-depth scatter (ref metrics.py:216-234)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(np.asarray(gt_depths), np.asarray(depth_errors), s=4)
    ax.set_xlim(0, 2.0)
    ax.set_ylim(0, 0.2)
    ax.set_xlabel("gt root depth (m)")
    ax.set_ylabel("root depth error (m)")
    ax.set_title(title or "root depth error vs gt depth")
    fig.savefig(save_path, dpi=100)
    plt.close(fig)
    return save_path


def draw_add_curve(dis3d, save_path, title="ADD curve", auc_value=None):
    """ADD threshold curve + distance histograms (ref metrics.py:165-213)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dis3d = np.asarray(dis3d, np.float64)
    ts = np.arange(0.0, 0.1, 1e-5)
    frac = (dis3d[None, :] <= ts[:, None]).mean(axis=1)
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    axes[0].plot(ts, frac)
    axes[0].set_xlim(0, 0.1)
    axes[0].set_ylim(0, 1)
    axes[0].set_xlabel("ADD threshold (m)")
    axes[0].set_ylabel("fraction under threshold")
    axes[0].axvline(np.mean(dis3d), color="red", ls="--", label="mean")
    axes[0].axvline(np.median(dis3d), color="green", ls="--", label="median")
    if auc_value is not None:
        axes[0].text(0.002, 0.9, f"AUC={auc_value*100:.2f}")
    axes[0].legend()
    axes[0].set_title(title)
    axes[1].hist(np.clip(dis3d, 0, 0.5), bins=60)
    axes[1].set_title("3D distance distribution")
    fig.savefig(save_path, dpi=100)
    plt.close(fig)
    return save_path
