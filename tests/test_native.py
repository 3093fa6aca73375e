"""Native C++ crop/resize kernel vs numpy reference."""

import numpy as np
import pytest

from hrpe_tpu import native


def numpy_crop_resize(img, bbox, S):
    """Reference: square-pad canvas then align_corners=False bilinear."""
    x1, y1, x2, y2 = [int(v) for v in bbox]
    bw, bh = x2 - x1, y2 - y1
    L = max(bw, bh)
    ox, oy = (L - bw) // 2, (L - bh) // 2
    canvas = np.zeros((L, L, 3), np.float32)
    canvas[oy : oy + bh, ox : ox + bw] = img[y1:y2, x1:x2]
    scale = L / S
    out = np.zeros((S, S, 3), np.float32)
    for j in range(S):
        sy = (j + 0.5) * scale - 0.5
        y0 = int(np.floor(sy))
        fy = sy - y0
        for i in range(S):
            sx = (i + 0.5) * scale - 0.5
            x0 = int(np.floor(sx))
            fx = sx - x0
            acc = np.zeros(3, np.float32)
            for dy in (0, 1):
                yy = y0 + dy
                wy = fy if dy else 1 - fy
                if not (0 <= yy < L):
                    continue
                for dx in (0, 1):
                    xx = x0 + dx
                    wx = fx if dx else 1 - fx
                    if not (0 <= xx < L):
                        continue
                    acc += wy * wx * canvas[yy, xx]
            out[j, i] = acc
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def test_crop_resize_matches_reference():
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    B, H, W, S = 3, 60, 80, 32
    imgs = rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8)
    boxes = np.array(
        [[10, 5, 70, 55], [0, 0, 40, 60], [20, 10, 50, 40]], np.float32
    )
    out = native.crop_resize_batch(imgs, boxes, S)
    assert out is not None and out.shape == (B, S, S, 3)
    for b in range(B):
        ref = numpy_crop_resize(imgs[b].astype(np.float32), boxes[b], S)
        diff = np.abs(out[b].astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()  # rounding-only differences


def test_channel_gain():
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    ref = imgs.astype(np.float32).copy()
    gains = np.array([[1.5, 0.5, 1.0], [0.2, 2.0, 1.1]], np.float32)
    out = native.channel_gain_batch(imgs.copy(), gains)
    assert out is not None
    expect = np.clip(ref * gains[:, None, None, :], 0, 255).astype(np.uint8)
    assert np.abs(out.astype(int) - expect.astype(int)).max() <= 1
