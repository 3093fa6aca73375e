"""Visualization utilities (host-side matplotlib).

Counterparts of lib/utils/vis.py: 2D keypoint overlays, 3D keypoint
comparison plots, silhouette overlays. Off the training path (CPU-only),
so kept deliberately simple.
"""

from __future__ import annotations

import numpy as np


def overlay_keypoints(image: np.ndarray, kp2d: np.ndarray, color=(255, 0, 0), r=3):
    """Draw keypoints onto an HxWx3 uint8 image (pure numpy, no cv2 need)."""
    out = image.copy()
    H, W = out.shape[:2]
    for x, y in np.asarray(kp2d):
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < W and 0 <= yi < H:
            y0, y1 = max(0, yi - r), min(H, yi + r + 1)
            x0, x1 = max(0, xi - r), min(W, xi + r + 1)
            out[y0:y1, x0:x1] = color
    return out


def save_keypoint_overlay(path, image, kp2d_pred, kp2d_gt=None):
    """Save overlay PNG (ref fullnet_test.py:236-272 output)."""
    from PIL import Image

    img = overlay_keypoints(image, kp2d_pred, (255, 0, 0))
    if kp2d_gt is not None:
        img = overlay_keypoints(img, kp2d_gt, (0, 255, 0))
    Image.fromarray(img).save(path)
    return path


def plot_joints_3d(kp_pred, kp_gt, save_path=None, title=""):
    """3D scatter comparison (ref vis.py:40-378 simplified)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    kp_pred = np.asarray(kp_pred)
    kp_gt = np.asarray(kp_gt)
    ax.plot(kp_pred[:, 0], kp_pred[:, 1], kp_pred[:, 2], "ro-", label="pred")
    ax.plot(kp_gt[:, 0], kp_gt[:, 1], kp_gt[:, 2], "go-", label="gt")
    ax.set_title(title)
    ax.legend()
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig


def save_mask_overlay(path, image, mask, alpha=0.5):
    """Blend a [0,1] mask in red over an image (sim2real debugging)."""
    from PIL import Image

    img = np.asarray(image, np.float32).copy()
    m = np.asarray(mask, np.float32)
    if m.shape[:2] != img.shape[:2]:
        m = np.asarray(
            Image.fromarray((m * 255).astype(np.uint8)).resize(
                (img.shape[1], img.shape[0])
            ),
            np.float32,
        ) / 255.0
    img[..., 0] = img[..., 0] * (1 - alpha * m) + 255 * alpha * m
    Image.fromarray(img.astype(np.uint8)).save(path)
    return path
