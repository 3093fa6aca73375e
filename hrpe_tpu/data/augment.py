"""Train-time image augmentations (host-side, PIL/numpy).

Counterparts of lib/dataset/augmentations.py with the same distributions
(dream.py:346-389): color jitter p=0.4 factor U(1-c,1+c) per channel with
c=2*U(0,1); occlusion rectangle p=occlu_p area U(0,0.3)*bbox aspect
U(0.5,2); Pillow sharpness/contrast/brightness/color each p=0.3. All
randomness goes through an explicit np.random.RandomState so the pipeline
is seedable/deterministic (the reference uses global `random`).
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def color_jitter(rgb: np.ndarray, rng) -> np.ndarray:
    """Per-channel random gain (ref dream.py:346-354), p handled by caller.

    Hot path of the train-time CPU pipeline: uses the native fused kernel
    (native/crop_resize.cpp channel_gain_batch — one pass, no f32
    temporaries) when the shared library is available, else numpy."""
    c = 2 * rng.random_sample()
    lo, hi = 1 - c, 1 + c
    gains = np.asarray([rng.uniform(lo, hi) for _ in range(3)], np.float32)

    from ..native import channel_gain_batch

    if rgb.dtype == np.uint8:
        out = channel_gain_batch(rgb[None].copy(), gains)
        if out is not None:
            return out[0]
    out = rgb.astype(np.float32).copy()
    for ch in range(3):
        out[..., ch] = np.clip(out[..., ch] * gains[ch], 0, 255)
    return out.astype(np.uint8)


def occlusion_rect(bbox, img_hw, rng, min_area=0.0, max_area=0.3, max_tries=5):
    """Sample an occlusion rectangle inside the frame (ref augmentations.py:41-75).

    Returns (ymin, h, xmin, w) or zeros when no valid sample found.
    """
    x1, y1, x2, y2 = bbox
    H, W = img_hw
    for _ in range(max_tries + 1):
        area = (rng.random_sample() * (max_area - min_area) + min_area) * (
            (x2 - x1) * (y2 - y1)
        )
        ratio = rng.random_sample() * 1.5 + 0.5
        h = math.sqrt(max(area * ratio, 0.0))
        w = math.sqrt(max(area / ratio, 1e-9))
        ox = rng.random_sample() * ((x2 - x1) - w - 1) + x1
        oy = rng.random_sample() * ((y2 - y1) - h - 1) + y1
        if ox >= 0 and oy >= 0 and ox + w < W and oy + h < H:
            return int(oy), int(h), int(ox), int(w)
    return 0, 0, 0, 0


def apply_occlusion(rgb: np.ndarray, bbox, rng) -> np.ndarray:
    oy, h, ox, w = occlusion_rect(bbox, rgb.shape[:2], rng)
    if h > 0 and w > 0:
        rgb = rgb.copy()
        rgb[oy : oy + h, ox : ox + w] = (
            rng.random_sample((h, w, 3)) * 255
        ).astype(rgb.dtype)
    return rgb


def _luminance(img: np.ndarray) -> np.ndarray:
    # ITU-R 601-2, the convention of PIL's convert("L")
    return 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]


def _smooth3(img: np.ndarray) -> np.ndarray:
    """PIL ImageFilter.SMOOTH: 3x3 kernel (1,1,1,1,5,1,1,1,1)/13; border
    pixels are copied from the input (PIL's kernel-filter convention)."""
    out = img.copy()
    c = img[1:-1, 1:-1]
    acc = 5.0 * c
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + img[1 + dy : img.shape[0] - 1 + dy,
                            1 + dx : img.shape[1] - 1 + dx]
    out[1:-1, 1:-1] = acc / 13.0
    return out


def _enh_sharpness(img, f):
    return _smooth3(img) * (1.0 - f) + img * f


def _enh_contrast(img, f):
    mean = np.rint(_luminance(img).mean())
    return mean * (1.0 - f) + img * f


def _enh_brightness(img, f):
    return img * f


def _enh_color(img, f):
    gray = _luminance(img)[..., None]
    return gray * (1.0 - f) + img * f


_PHOTOMETRIC_AUGS = [
    (_enh_sharpness, (0.0, 50.0)),
    (_enh_contrast, (0.7, 1.8)),
    (_enh_brightness, (0.7, 1.8)),
    (_enh_color, (0.0, 4.0)),
]


def pil_photometric(rgb: np.ndarray, rng, p=0.3, roi=None) -> np.ndarray:
    """Sharpness/contrast/brightness/color chain (ref const.py:5-10).

    Vectorized numpy re-implementation of the PIL ImageEnhance chain
    (identical blend math, per-step rounding like PIL; sharpness uses the
    SMOOTH kernel with PIL's copy-border convention) — the PIL version
    cost ~9 ms/sample on this host, the hot third of the CPU pipeline.
    The rng call sequence is unchanged, so seeded runs reproduce.

    `roi=(y1, y2, x1, x2)`: apply the enhancement only inside the window
    (the contrast mean statistic is still computed over the FULL image,
    like PIL). Used by the dataset pipeline with the crop extent — pixels
    outside the crop never reach the model, and enhancing only the window
    cuts the dominant CPU cost ~4x on 640x480 frames.

    Documented approximation (ADVICE r4): when contrast fires AFTER an
    earlier ROI-only step (e.g. sharpness), its full-image mean is taken
    over a frame whose ROI was already modified, whereas PIL's full-image
    chain would have modified the whole frame first. The blend constant
    can deviate by the sharpness-induced shift of the ROI's share of the
    global luminance mean — sub-1-gray-level for typical crops; accepted
    in exchange for the 4x pipeline speedup."""
    if roi is None:
        img = rgb.astype(np.float32)
        for enh, interval in _PHOTOMETRIC_AUGS:
            if rng.random_sample() <= p:
                img = np.clip(np.rint(enh(img, rng.uniform(*interval))), 0, 255)
        return img.astype(np.uint8)

    H, W = rgb.shape[:2]
    y1 = max(0, int(roi[0])); y2 = min(H, int(roi[1]))
    x1 = max(0, int(roi[2])); x2 = min(W, int(roi[3]))
    if y2 <= y1 or x2 <= x1:
        return pil_photometric(rgb, rng, p)
    out = rgb.copy()
    for enh, interval in _PHOTOMETRIC_AUGS:
        if rng.random_sample() <= p:
            f = rng.uniform(*interval)
            if enh is _enh_contrast:
                # PIL computes the mean over the whole image
                mean = np.rint(_luminance(out.astype(np.float32)).mean())
                win = out[y1:y2, x1:x2].astype(np.float32)
                res = mean * (1.0 - f) + win * f
            elif enh is _enh_sharpness:
                # expand by 1px for the 3x3 kernel, write back the window
                ey1, ey2 = max(0, y1 - 1), min(H, y2 + 1)
                ex1, ex2 = max(0, x1 - 1), min(W, x2 + 1)
                ewin = out[ey1:ey2, ex1:ex2].astype(np.float32)
                eres = _enh_sharpness(ewin, f)
                res = eres[y1 - ey1 : eres.shape[0] - (ey2 - y2),
                           x1 - ex1 : eres.shape[1] - (ex2 - x2)]
            else:
                win = out[y1:y2, x1:x2].astype(np.float32)
                res = enh(win, f)
            out[y1:y2, x1:x2] = np.clip(np.rint(res), 0, 255).astype(np.uint8)
    return out


def pil_blur(rgb: np.ndarray, rng, p=0.4, kmin=1, kmax=3) -> np.ndarray:
    if rng.random_sample() <= p:
        im = Image.fromarray(rgb).filter(
            ImageFilter.GaussianBlur(rng.randint(kmin, kmax + 1))
        )
        return np.asarray(im)
    return rgb


def grayscale(rgb: np.ndarray, rng, p=0.3) -> np.ndarray:
    if rng.random_sample() <= p:
        g = (
            0.2989 * rgb[..., 0] + 0.5870 * rgb[..., 1] + 0.1140 * rgb[..., 2]
        ).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=-1)
    return rgb


def resize_with_K(
    rgb: np.ndarray, K: np.ndarray, out_hw, keypoints_3d: np.ndarray
):
    """Resize to out_hw, update K, reproject 2D keypoints from 3D.

    Ref parity: CropResizeToAspectAugmentation (augmentations.py:165-263)
    — the reference routes this through get_K_crop_resize with the full-
    frame box and reprojects keypoints through the new K; identical here.
    """
    from ..utils import geometry as G
    import jax.numpy as jnp

    h, w = rgb.shape[:2]
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        im = Image.fromarray(rgb).resize((ow, oh), Image.BILINEAR)
        rgb = np.asarray(im)
        box = np.array([[0.0, 0.0, w, h]])
        K = G.get_K_crop_resize_np(K[None], box, (oh, ow))[0]
    kp2d = np.asarray(keypoints_3d) @ K.T
    kp2d = kp2d[:, :2] / kp2d[:, 2:3]
    return rgb, K, kp2d


def flip_image_K(rgb, K, keypoints_2d, flip_pairs=None):
    """Horizontal flip: mirror image, negate fx, mirror cx, swap L/R kps.

    Ref parity: FlipAugmentation (augmentations.py:307-319).
    """
    rgb = rgb[:, ::-1].copy()
    w = rgb.shape[1]
    kp = keypoints_2d.copy()
    kp[:, 0] = w - kp[:, 0] - 1
    if flip_pairs is not None:
        for a, b in flip_pairs:
            kp[[a, b]] = kp[[b, a]]
    K = K.copy()
    K[0, 0] = -K[0, 0]
    K[0, 2] = w - 1 - K[0, 2]
    return rgb, K, kp


def rotate_90(rgb, K, kp2d, kp3d, bboxes=()):
    """90-degree rotation of the full observation (ref
    augmentations.py:327-357 RotationAugmentation, reproduced exactly
    incl. its `width - y + 1` 2D convention): image via
    new[j][h-1-i] = old[i][j], principal point swapped in K, keypoints_3d
    rotated by Rz(+90deg) (depth invariant), 2D keypoints via
    rotate_joints_2d (augmentations.py:321-325). `bboxes` are rotated with
    the same convention. Returns (rgb, K, kp2d, kp3d, rotated_bboxes).
    """
    h = rgb.shape[0]
    out = np.ascontiguousarray(np.rot90(rgb, k=-1))
    K2 = K.copy()
    K2[0, 2], K2[1, 2] = K[1, 2], K[0, 2]
    kp2d_r = kp2d.copy()
    kp2d_r[:, 1] = kp2d[:, 0]
    kp2d_r[:, 0] = h - kp2d[:, 1] + 1
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    kp3d_r = kp3d @ Rz.T
    rb = []
    for b in bboxes:
        if b is None:
            rb.append(None)
            continue
        x1, y1, x2, y2 = b[:4]
        rb.append(np.array([h - y2 + 1, x1, h - y1 + 1, x2], dtype=np.float64))
    return out, K2, kp2d_r, kp3d_r, tuple(rb)
