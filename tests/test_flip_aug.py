"""Flip augmentation geometric consistency."""

import numpy as np
import jax.numpy as jnp

from hrpe_tpu.data.augment import flip_image_K
from hrpe_tpu.utils.geometry import project_points


def test_flip_preserves_projection():
    # after flipping image + K (negated fx, mirrored cx, ref
    # augmentations.py:307-319), 3D points project to the flipped 2D spots
    rng = np.random.RandomState(0)
    K = np.array([[320.0, 0, 128.0], [0, 320.0, 120.0], [0, 0, 1.0]])
    pts3d = rng.uniform(-0.2, 0.2, (5, 3)) + [0, 0, 1.0]
    uv = np.asarray(project_points(jnp.asarray(K)[None], jnp.asarray(pts3d)[None]))[0]
    img = rng.randint(0, 255, (240, 256, 3)).astype(np.uint8)
    img_f, K_f, uv_f = flip_image_K(img, K, uv.copy())
    uv2 = np.asarray(
        project_points(jnp.asarray(K_f)[None], jnp.asarray(pts3d)[None])
    )[0]
    np.testing.assert_allclose(uv2, uv_f, atol=1e-3)
    # image actually mirrored
    np.testing.assert_array_equal(img_f[:, 0], img[:, -1])


def test_flip_pairs_swap():
    K = np.eye(3)
    kp = np.arange(10, dtype=np.float64).reshape(5, 2)
    img = np.zeros((4, 8, 3), np.uint8)
    _, _, kp_f = flip_image_K(img, K, kp.copy(), flip_pairs=[[1, 2]])
    # rows 1 and 2 swapped (after x mirror)
    w = 8
    exp1 = np.array([w - kp[2, 0] - 1, kp[2, 1]])
    np.testing.assert_allclose(kp_f[1], exp1)
