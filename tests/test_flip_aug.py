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


def test_rotate_90_consistency():
    """rotate_90 (ref augmentations.py:327-357): rotated 3D keypoints
    reproject through the swapped-principal-point K to the rotated 2D
    spots (within the reference's own +-1 px convention), depth invariant,
    image content actually rotated."""
    from hrpe_tpu.data.augment import rotate_90

    rng = np.random.RandomState(1)
    K = np.array([[320.0, 0, 128.0], [0, 320.0, 120.0], [0, 0, 1.0]])
    pts3d = rng.uniform(-0.2, 0.2, (6, 3)) + [0, 0, 1.2]
    uv = np.asarray(project_points(jnp.asarray(K)[None], jnp.asarray(pts3d)[None]))[0]
    img = rng.randint(0, 255, (240, 256, 3)).astype(np.uint8)
    bbox = np.array([40.0, 30.0, 200.0, 180.0])

    img_r, K_r, uv_r, pts_r, (bbox_r,) = rotate_90(img, K, uv.copy(), pts3d, (bbox,))
    assert img_r.shape == (256, 240, 3)
    # new[j][h-1-i] = old[i][j]
    np.testing.assert_array_equal(img_r[5, 240 - 1 - 7], img[7, 5])
    # depth untouched
    np.testing.assert_allclose(pts_r[:, 2], pts3d[:, 2])
    # reprojection of the rotated 3D through the rotated K ~ rotated 2D
    uv2 = np.asarray(
        project_points(jnp.asarray(K_r)[None], jnp.asarray(pts_r)[None])
    )[0]
    assert np.abs(uv2 - uv_r).max() < 1.5, np.abs(uv2 - uv_r).max()
    # bbox corners stay ordered
    assert bbox_r[0] < bbox_r[2] and bbox_r[1] < bbox_r[3]


def test_dataset_rotate_smoke(tmp_path):
    """DreamDataset(rotate=True) produces finite fixed-shape samples whose
    root-view 2D keypoints remain consistent with the 3D ones."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_pickle_dataset

    from hrpe_tpu.data.dream import DreamDataset

    d = tmp_path / "dofbot_synth_train_dr"
    make_pickle_dataset(d, "dofbot", n=2)
    ds = DreamDataset(
        str(d), rootnet_resize_hw=(64, 64), other_resize_hw=(64, 64),
        color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False, rotate=True, seed=3,
    )
    for i in range(len(ds)):
        s = ds[i]
        assert np.isfinite(s["root"]["K"]).all()
        assert s["root"]["images"].shape == (64, 64, 3)
        assert np.isfinite(s["root"]["keypoints_3d"]).all()
