"""Bounding-box math for the crop pipeline (host-side numpy).

Numpy counterparts of the reference's lib/dataset/roboutils.py bbox
helpers; semantics preserved (30% expansion, 150/120 px minimum-size
floors, K-space bbox reprojection) so crops and k-values match.
"""

from __future__ import annotations

import numpy as np


def expand_bbox(bbox, w, h, strict=True, rng: np.random.RandomState | None = None):
    """Clip to frame, expand 30% per side, enforce min size, optional jitter.

    Ref parity: roboutils.py:70-114 `get_bbox` (incl. the non-strict random
    +-20%-of-size jitter used for train-time crops).
    """
    x1, y1, x2, y2 = bbox
    x1, y1, x2, y2 = max(0, x1), max(0, y1), min(w, x2), min(h, y2)
    bw, bh = x2 - x1, y2 - y1
    x1 = int(max(0, x1 - 0.3 * bw))
    x2 = int(min(w, x2 + 0.3 * bw))
    y1 = int(max(0, y1 - 0.3 * bh))
    y2 = int(min(h, y2 + 0.3 * bh))
    bw, bh = x2 - x1, y2 - y1

    if not strict:
        rng = rng or np.random
        dw = (rng.random_sample() - 0.2) / 2 * bw
        dh = (rng.random_sample() - 0.2) / 2 * bh
        x1 = int(max(0, x1 - dw / 2))
        x2 = int(min(w, x2 + dw / 2))
        y1 = int(max(0, y1 - dh / 2))
        y2 = int(min(h, y2 + dh / 2))
        bw, bh = x2 - x1, y2 - y1

    if bw < 150:
        x1 -= 75
        x2 += 75
    if bh < 120:
        y1 -= 60
        y2 += 60
    x1, y1, x2, y2 = max(0, x1), max(0, y1), min(w, x2), min(h, y2)
    return np.array([x1, y1, x2, y2])


def expand_bbox_raw(bbox):
    """Unclipped variant (ref roboutils.py:120-140)."""
    x1, y1, x2, y2 = bbox
    bw, bh = x2 - x1, y2 - y1
    x1, x2 = int(x1 - 0.3 * bw), int(x2 + 0.3 * bw)
    y1, y2 = int(y1 - 0.3 * bh), int(y2 + 0.3 * bh)
    if x2 - x1 < 150:
        x1 -= 75
        x2 += 75
    if y2 - y1 < 120:
        y1 -= 60
        y2 += 60
    return np.array([x1, y1, x2, y2])


def extend_bbox(bbox, dx1, dy1, dx2, dy2, image_size=None):
    """Per-side pixel extension, clipped to image_size=(w,h) if given.

    Ref parity: roboutils.py:269-278.
    """
    x1, y1, x2, y2 = bbox
    out = np.array([x1 - dx1, y1 - dy1, x2 + dx2, y2 + dy2])
    if image_size is not None:
        w, h = image_size
        out = np.array(
            [max(0, out[0]), max(0, out[1]), min(w, out[2]), min(h, out[3])]
        )
    return out


def square_pad_crop(image, bbox, K, keypoints_2d):
    """Crop bbox, paste centered into a square canvas, shift K accordingly.

    Returns (square_image, new_K, new_keypoints_2d). Ref parity:
    roboutils.py:142-173 `resize_image` (principal point moves by
    crop-origin minus centering offset).
    """
    x1, y1, x2, y2 = [int(v) for v in bbox]
    side = int(max(x2 - x1, y2 - y1))
    canvas = np.zeros((side, side, 3), dtype=np.uint8)
    ox = int((side - (x2 - x1)) // 2)
    oy = int((side - (y2 - y1)) // 2)
    canvas[oy : oy + (y2 - y1), ox : ox + (x2 - x1)] = image[y1:y2, x1:x2]
    kp = np.asarray(keypoints_2d, np.float64).copy()
    kp[:, 0] += ox - x1
    kp[:, 1] += oy - y1
    K2 = np.asarray(K, np.float64).copy()
    K2[0, 2] -= x1 - ox
    K2[1, 2] -= y1 - oy
    return canvas, K2, kp


def process_truncation(image, kp2d, K, max_pad=(120, 120, 120, 120),
                       frame_wh=(640, 480)):
    """Grow the canvas when the robot is truncated by the frame edges so
    the crop can still center it (ref roboutils.py:180-212). Returns
    (new_image, new_kp2d, new_K) — unchanged when nothing is truncated.
    """
    W, H = frame_wh
    tight = keypoint_bbox(kp2d)
    x1, y1, x2, y2 = tight
    dl = int(min(max_pad[0], max(0, -x1)))
    dt = int(min(max_pad[1], max(0, -y1)))
    dr = int(min(max_pad[2], max(0, x2 - W)))
    db = int(min(max_pad[3], max(0, y2 - H)))
    if dl == dt == dr == db == 0:
        return image, kp2d, K
    new_img = np.zeros((H + dt + db, W + dl + dr, 3), image.dtype)
    new_img[dt : dt + H, dl : dl + W] = image
    kp = np.asarray(kp2d, np.float64).copy()
    kp[:, 0] += dl
    kp[:, 1] += dt
    K2 = np.asarray(K, np.float64).copy()
    K2[0, 2] += dl
    K2[1, 2] += dt
    return new_img, kp, K2


def process_padding(image, kp2d, K, pad=30):
    """Uniform border padding with K/keypoint shift (ref roboutils.py:214-246)."""
    h, w = image.shape[:2]
    new_img = np.zeros((h + 2 * pad, w + 2 * pad, 3), image.dtype)
    new_img[pad : pad + h, pad : pad + w] = image
    kp = np.asarray(kp2d, np.float64).copy() + pad
    K2 = np.asarray(K, np.float64).copy()
    K2[0, 2] += pad
    K2[1, 2] += pad
    return new_img, kp, K2


def bbox_through_K(bbox, K_old_inv, K_new, out_wh):
    """Map a bbox between camera models via ray reprojection.

    Ref parity: roboutils.py:248-263 `bbox_transform`.
    """
    x1, y1, x2, y2 = bbox
    corners = np.array(
        [[x1, y1, 1.0], [x2, y1, 1.0], [x2, y2, 1.0], [x1, y2, 1.0]]
    )
    rays = K_old_inv @ corners.T
    mapped = (K_new @ rays).T
    w, h = out_wh
    return np.array(
        [
            np.clip(mapped[0, 0], 0, w),
            np.clip(mapped[0, 1], 0, h),
            np.clip(mapped[1, 0], 0, w),
            np.clip(mapped[2, 1], 0, h),
        ]
    )


def keypoint_bbox(keypoints_2d):
    """Tight bbox around 2D keypoints: [min_x, min_y, max_x, max_y]."""
    kp = np.asarray(keypoints_2d)[:, :2]
    return np.concatenate([kp.min(axis=0), kp.max(axis=0)])
