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


def _connectivity(n_kp: int, robot: str | None = None):
    """Skeleton edges between keypoints. Serial chains connect consecutive
    keypoints; baxter's branching tree gets its own table (ref
    vis.py CONNECTIVITY_DICT semantics)."""
    if robot == "baxter":
        # torso -> head, torso -> left/right arm chains (17 keypoints:
        # 1 torso + 8 per arm, const.py:61-75 ordering)
        edges = [(0, 1)]
        for base in (1, 9):
            edges += [(i, i + 1) for i in range(base, base + 7)]
        return [e for e in edges if e[1] < n_kp]
    return [(i, i + 1) for i in range(n_kp - 1)]


def vis_joints_3d_grid(
    images,
    kp3d_pred,
    kp3d_gt,
    K,
    save_path,
    n_samples: int = 8,
    robot: str | None = None,
    errors=None,
    title: str = "",
):
    """Multi-sample pred-vs-GT grid (ref vis.py:40-378 `vis_joints_3d`).

    One row per sample, four panels: input image with projected pred(red)
    / GT(green) keypoint overlays, then the 3D skeletons from three view
    angles. images (B,H,W,3) uint8; kp3d_* (B,K,3) camera-frame metres;
    K (B,3,3) intrinsics of the crop view.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    kp3d_pred = np.asarray(kp3d_pred)
    kp3d_gt = np.asarray(kp3d_gt)
    K = np.asarray(K)
    B = min(n_samples, len(images))
    edges = _connectivity(kp3d_pred.shape[1], robot)
    views = [(20, -60), (90, -90), (0, -90)]

    fig = plt.figure(figsize=(4 * 3.2, B * 3.0))
    for r in range(B):
        proj = lambda p: (p @ K[r].T)[:, :2] / np.maximum(
            (p @ K[r].T)[:, 2:3], 1e-9
        )
        ax = fig.add_subplot(B, 4, r * 4 + 1)
        ax.imshow(images[r])
        for pts, c in ((proj(kp3d_gt[r]), "lime"), (proj(kp3d_pred[r]), "red")):
            ax.scatter(pts[:, 0], pts[:, 1], c=c, s=12)
            for a, b in edges:
                ax.plot(pts[[a, b], 0], pts[[a, b], 1], c=c, lw=1)
        ax.set_xlim(0, images[r].shape[1])
        ax.set_ylim(images[r].shape[0], 0)
        ax.axis("off")
        if errors is not None:
            ax.set_title(f"ADD {errors[r]*1000:.1f} mm", fontsize=8)
        for v, (elev, azim) in enumerate(views):
            ax3 = fig.add_subplot(B, 4, r * 4 + 2 + v, projection="3d")
            for pts, c, lbl in ((kp3d_gt[r], "green", "gt"),
                                (kp3d_pred[r], "red", "pred")):
                ax3.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=c, s=8)
                for a, b in edges:
                    ax3.plot(pts[[a, b], 0], pts[[a, b], 1], pts[[a, b], 2],
                             c=c, lw=1)
            ax3.view_init(elev=elev, azim=azim)
            ax3.tick_params(labelsize=5)
            if r == 0 and v == 0:
                ax3.legend(["gt", "pred"], fontsize=6)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(save_path, dpi=90)
    plt.close(fig)
    return save_path


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
