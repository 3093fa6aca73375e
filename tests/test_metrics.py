"""Metric semantics tests: AUC integration grid, thresholds, batch errors."""

import numpy as np
import jax.numpy as jnp

from hrpe_tpu.engine.metrics import (
    auc,
    compute_metrics_batch,
    summary_add_pck,
)
from hrpe_tpu.kinematics import load_robot


def test_auc_matches_reference_integration():
    # reference integrates mean(d <= t) for t in arange(0, 0.1, 1e-5) with
    # trapezoid / 0.1 (metrics.py:127-136); closed form for point masses:
    dis = np.array([0.05])  # single distance at 5 cm
    # frac(t) = 0 for t < 0.05, 1 for t >= 0.05 -> area = 0.05 - eps edge
    a = auc(dis, 0.1, 1e-5)
    assert abs(a - 0.5) < 1e-3, a
    # all distances beyond the threshold -> AUC 0
    assert auc(np.array([1.0, 2.0]), 0.1, 1e-5) == 0.0
    # all at zero -> AUC ~1
    assert auc(np.array([0.0, 0.0]), 0.1, 1e-5) > 0.999


def test_summary_thresholds():
    dis3d = np.array([0.004, 0.015, 0.5])
    dis2d = np.array([2.0, 6.0, 30.0])
    s = summary_add_pck(dis3d, dis2d)
    assert s["ADD_5_mm"] == 1 / 3
    assert s["ADD_20_mm"] == 2 / 3
    assert s["PCK_2.5_pixel"] == 1 / 3
    assert s["PCK_10.0_pixel"] == 2 / 3
    assert 0 <= s["ADD/AUC"] <= 1 and 0 <= s["PCK/AUC"] <= 1


def test_compute_metrics_batch_exact_zero():
    robot = load_robot("dofbot")
    B, K = 2, 8
    rng = np.random.RandomState(0)
    kp3d = jnp.asarray(rng.uniform(-0.2, 0.2, (B, K, 3)) + [0, 0, 1.0], jnp.float32)
    Km = jnp.tile(jnp.asarray([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1.0]]), (B, 1, 1))
    from hrpe_tpu.utils.geometry import project_points

    kp2d = project_points(Km, kp3d)
    gt_joint = jnp.zeros((B, 6))
    m = compute_metrics_batch(
        robot, kp3d, kp2d, Km, gt_joint, kp3d,
        pred_joint=gt_joint, reference_keypoint_id=1,
    )
    np.testing.assert_allclose(np.asarray(m["image_dis3d"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m["image_dis2d"]), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m["depth_err"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m["image_joint_err"]), 0.0, atol=1e-6)


def test_out_of_frame_keypoints_masked():
    robot = load_robot("dofbot")
    B, K = 1, 8
    kp3d = jnp.zeros((B, K, 3)) + jnp.asarray([0, 0, 1.0])
    Km = jnp.tile(jnp.asarray([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1.0]]), (B, 1, 1))
    # gt 2D far outside the 640x480 frame for half the keypoints
    gt2d = np.full((B, K, 2), 320.0, np.float32)
    gt2d[0, :4] = 10_000.0
    pred3d = kp3d + 0.01
    m = compute_metrics_batch(
        robot, kp3d, jnp.asarray(gt2d), Km, jnp.zeros((B, 6)), pred3d,
        pred_joint=None, reference_keypoint_id=1,
    )
    # per-kp 2D distances for the masked keypoints contribute zero
    d = np.asarray(m["dis2d_per_kp"])
    assert (d[:4] == 0).all() and (d[4:] > 0).all()
