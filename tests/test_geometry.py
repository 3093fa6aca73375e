"""Geometry core tests: round-trips and golden conventions.

These encode the reference's conventions (rot6d rows, quat w-major branch,
K crop-resize center math) as properties; the reference left the
uvd<->xyz round-trip check commented out (integral.py:160-162) — here it is
a real test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrpe_tpu.utils import geometry as G
from hrpe_tpu.utils import transforms as T


def random_rotmats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    # force w >= 0 so the reference's w-major quat extraction is valid
    q[q[:, 0] < 0] *= -1
    return np.asarray(G.quat_to_rotmat(jnp.asarray(q)))


def test_quat_rotmat_roundtrip():
    R = random_rotmats(32)
    q = G.rotmat_to_quat(jnp.asarray(R))
    R2 = G.quat_to_rotmat(q)
    np.testing.assert_allclose(R, np.asarray(R2), atol=1e-5)


def test_rot6d_roundtrip():
    R = random_rotmats(32, seed=1)
    r6 = G.rotmat_to_rot6d(jnp.asarray(R))
    R2 = G.rot6d_to_rotmat(r6)
    np.testing.assert_allclose(R, np.asarray(R2), atol=1e-5)
    # determinant +1, orthonormal
    np.testing.assert_allclose(np.linalg.det(np.asarray(R2)), 1.0, atol=1e-5)


def test_rot6d_rows_convention():
    # the 6d rep is the first two ROWS of R (reference geometries.py:117-132)
    R = random_rotmats(4, seed=2)
    r6 = np.asarray(G.rotmat_to_rot6d(jnp.asarray(R)))
    np.testing.assert_allclose(r6[:, :3], R[:, 0, :], atol=1e-6)
    np.testing.assert_allclose(r6[:, 3:], R[:, 1, :], atol=1e-6)


def test_rot9d_projection():
    rng = np.random.RandomState(3)
    r9 = rng.randn(16, 9).astype(np.float32)
    R = np.asarray(G.rot9d_to_rotmat(jnp.asarray(r9)))
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-4
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_axis_angle_roundtrip_and_taylor():
    rng = np.random.RandomState(4)
    aa = rng.randn(16, 3).astype(np.float32)
    R = G.axis_angle_to_rotmat(jnp.asarray(aa))
    aa2 = G.rotmat_to_axis_angle(R)
    np.testing.assert_allclose(aa, np.asarray(aa2), atol=1e-3)
    # tiny angles go through the Taylor branch without NaNs
    tiny = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 1e-8)
    R_tiny = G.axis_angle_to_rotmat(tiny)
    assert np.isfinite(np.asarray(R_tiny)).all()
    np.testing.assert_allclose(np.asarray(R_tiny), np.eye(3)[None].repeat(8, 0), atol=1e-6)


def test_axis_angle_grad_finite_at_zero():
    g = jax.grad(lambda a: jnp.sum(G.axis_angle_to_rotmat(a)))(jnp.zeros((1, 3)))
    assert np.isfinite(np.asarray(g)).all()


def test_geodesic_distance():
    R = random_rotmats(8, seed=5)
    d = G.geodesic_distance(jnp.asarray(R), jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
    # 90 degrees about z
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    d = G.geodesic_distance(jnp.asarray(Rz)[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(d), np.pi / 2, atol=1e-5)


def test_invert_T():
    R = random_rotmats(8, seed=6)
    t = np.random.RandomState(7).randn(8, 3).astype(np.float32)
    Tm = G.make_T(jnp.asarray(R, jnp.float32), jnp.asarray(t))
    I = np.asarray(Tm @ G.invert_T(Tm))
    np.testing.assert_allclose(I, np.eye(4)[None].repeat(8, 0), atol=1e-5)


def test_inv_K_closed_form():
    K = jnp.asarray(
        [[[615.5, 0.0, 328.2], [0.0, 615.2, 251.8], [0.0, 0.0, 1.0]]]
    )
    np.testing.assert_allclose(
        np.asarray(G.inv_K(K)), np.linalg.inv(np.asarray(K)), atol=1e-6
    )


def test_K_crop_resize_identity():
    # full-frame crop at equal size: focals unchanged, principal point
    # shifted by the reference's (w-1)/2 center convention
    # (geometries.py:381-396 maps cx -> (out-1)/2 + (cx - crop_center))
    K = jnp.asarray([[[320.0, 0.0, 128.0], [0.0, 320.0, 128.0], [0.0, 0.0, 1.0]]])
    boxes = jnp.asarray([[0.0, 0.0, 256.0, 256.0]])
    K2 = np.asarray(G.get_K_crop_resize(K, boxes, (256, 256)))[0]
    assert K2[0, 0] == 320.0 and K2[1, 1] == 320.0
    np.testing.assert_allclose(K2[0, 2], 127.5, atol=1e-4)
    np.testing.assert_allclose(K2[1, 2], 127.5, atol=1e-4)


def test_K_crop_resize_projection_consistency():
    # a 3D point projected with updated K in crop space must equal the
    # original projection mapped through the same crop+resize
    K = jnp.asarray([[[615.0, 0.0, 320.0], [0.0, 610.0, 240.0], [0.0, 0.0, 1.0]]])
    box = np.array([100.0, 80.0, 420.0, 400.0])  # 320x320 crop
    K2 = G.get_K_crop_resize(K, jnp.asarray(box)[None], (256, 256))
    pt = jnp.asarray([[[0.1, -0.05, 0.8]]])
    uv_full = np.asarray(G.project_points(K, pt))[0, 0]
    uv_crop = np.asarray(G.project_points(K2, pt))[0, 0]
    scale = 256.0 / 320.0
    # derived from the reference formula: u' = s*(u - crop_center) + (out-1)/2
    crop_center = (box[:2] + box[2:]) / 2
    expect = (uv_full - crop_center) * scale + (256.0 - 1) / 2
    np.testing.assert_allclose(uv_crop, expect, atol=1e-3)


def test_uvd_xyz_roundtrip():
    rng = np.random.RandomState(8)
    B, Knum = 4, 7
    K = np.tile(
        np.array([[320.0, 0, 128.0], [0, 320.0, 128.0], [0, 0, 1.0]], np.float32),
        (B, 1, 1),
    )
    uvd = (rng.rand(B, Knum, 3).astype(np.float32) - 0.5) * 0.8
    root = np.concatenate(
        [rng.randn(B, 2).astype(np.float32) * 0.1, 1.0 + rng.rand(B, 1).astype(np.float32)],
        axis=-1,
    )
    df = 1.3
    xyz = T.uvd_to_xyz(jnp.asarray(uvd), 256.0, G.inv_K(jnp.asarray(K)), jnp.asarray(root), df)
    uvd2 = T.xyz_to_uvd(xyz, 256.0, jnp.asarray(K), jnp.asarray(root), df)
    np.testing.assert_allclose(uvd, np.asarray(uvd2), atol=1e-4)


def test_uvz_singlepoint_matches_uvd_path():
    B = 3
    K = jnp.tile(
        jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]]), (B, 1, 1)
    )
    uv = jnp.asarray([[320.0, 240.0], [100.0, 50.0], [600.0, 400.0]])
    z = jnp.asarray([[1.0], [2.0], [0.5]])
    xyz = T.uvz_to_xyz_singlepoint(uv, z, K)
    # reproject
    uv2 = G.project_points(K, xyz[:, None, :])[:, 0]
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(xyz[:, 2:3]), np.asarray(z), atol=1e-6)
