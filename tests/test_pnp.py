"""PnP solver tests: recovery of known poses, gradient checks, OpenCV cross-check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrpe_tpu.pnp import pnp_pose, pnp_pose_rt, reproject
from hrpe_tpu.utils.geometry import axis_angle_to_rotmat

K = np.array([[615.0, 0, 320.0], [0, 610.0, 240.0], [0, 0, 1.0]], np.float32)


def make_case(B=4, n=8, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    pts3d = rng.uniform(-0.3, 0.3, (B, n, 3)).astype(np.float32)
    rvec = rng.uniform(-1.0, 1.0, (B, 3)).astype(np.float32)
    t = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B), rng.uniform(0.8, 2.0, B)],
        axis=-1,
    ).astype(np.float32)
    theta = np.concatenate([rvec, t], axis=-1)
    pts2d = np.asarray(reproject(jnp.asarray(theta), jnp.asarray(pts3d), jnp.asarray(K)[None]))
    pts2d = pts2d + noise * rng.randn(*pts2d.shape).astype(np.float32)
    return pts2d.astype(np.float32), pts3d, theta


def test_pnp_exact_recovery():
    pts2d, pts3d, theta_gt = make_case()
    theta = pnp_pose(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K))
    # compare by reprojection error (theta itself has a 2*pi ambiguity)
    re = np.asarray(
        reproject(theta, jnp.asarray(pts3d), jnp.asarray(K)[None]) - pts2d
    )
    assert np.abs(re).max() < 1e-2, np.abs(re).max()
    R_gt = np.asarray(axis_angle_to_rotmat(jnp.asarray(theta_gt[:, :3])))
    R, t = pnp_pose_rt(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), theta_gt[:, 3:], atol=1e-3)


def test_pnp_noisy_stability():
    pts2d, pts3d, theta_gt = make_case(noise=1.0, seed=1)
    theta = np.asarray(pnp_pose(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K)))
    assert np.isfinite(theta).all()
    # translation within ~5 cm under 1 px noise
    np.testing.assert_allclose(theta[:, 3:], theta_gt[:, 3:], atol=0.08)


def test_pnp_gradients_flow():
    pts2d, pts3d, _ = make_case(B=2, seed=2)

    def loss(p2, p3):
        th = pnp_pose(p2, p3, jnp.asarray(K))
        return jnp.sum(th**2)

    g2, g3 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(pts2d), jnp.asarray(pts3d))
    assert np.isfinite(np.asarray(g2)).all() and np.isfinite(np.asarray(g3)).all()
    assert np.abs(np.asarray(g2)).max() > 0

    # finite-difference check on one coordinate of pts2d
    eps = 1e-3
    p2 = pts2d.copy()
    p2[0, 0, 0] += eps
    f1 = float(loss(jnp.asarray(p2), jnp.asarray(pts3d)))
    p2[0, 0, 0] -= 2 * eps
    f0 = float(loss(jnp.asarray(p2), jnp.asarray(pts3d)))
    fd = (f1 - f0) / (2 * eps)
    an = float(np.asarray(g2)[0, 0, 0])
    assert abs(fd - an) < 0.05 * max(1.0, abs(fd)), (fd, an)


def test_pnp_vs_opencv():
    cv = pytest.importorskip("cv2")
    pts2d, pts3d, _ = make_case(B=3, noise=0.5, seed=3)
    theta = np.asarray(pnp_pose(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K)))
    for i in range(3):
        ok, rvec, tvec = cv.solvePnP(
            pts3d[i].astype(np.float64),
            pts2d[i].reshape(-1, 1, 2).astype(np.float64),
            K.astype(np.float64), None, flags=cv.SOLVEPNP_EPNP,
        )
        ok, rvec, tvec = cv.solvePnP(
            pts3d[i].astype(np.float64),
            pts2d[i].reshape(-1, 1, 2).astype(np.float64),
            K.astype(np.float64), None, flags=cv.SOLVEPNP_ITERATIVE,
            useExtrinsicGuess=True, rvec=rvec, tvec=tvec,
        )
        np.testing.assert_allclose(theta[i, 3:], tvec[:, 0], atol=5e-3)
