"""Regression: loss gradients stay finite at exact-zero norm inputs.

With fix_root, xyz_int[:, ref] and xyz_fk[:, ref] both equal pred_trans by
construction, so the align loss differentiates ||0|| — jnp.linalg.norm's
NaN-gradient-at-zero silently discarded ~60% of round-3 training updates
(VERDICT r3 weak #1). safe_norm pins the torch subgradient convention.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.config import load_config
from hrpe_tpu.engine import losses as L


def test_safe_norm_zero_gradient():
    g = jax.grad(lambda x: jnp.sum(L.safe_norm(x, axis=-1)))(jnp.zeros((3, 4)))
    assert np.isfinite(np.asarray(g)).all()
    # nonzero inputs still match the plain norm + gradient
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(L.safe_norm(x)), np.asarray(jnp.linalg.norm(x, axis=-1)),
        rtol=1e-6,
    )
    g1 = jax.grad(lambda v: jnp.sum(L.safe_norm(v, axis=-1)))(x)
    g2 = jax.grad(lambda v: jnp.sum(jnp.linalg.norm(v, axis=-1)))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_full_net_losses_grad_finite_at_aligned_root():
    cfg = load_config("configs/dofbot/full.yaml")
    rng = np.random.RandomState(0)
    B, K, ref = 4, 8, cfg.reference_keypoint_id
    Kmat = np.tile(
        np.asarray([[320.0, 0, 128], [0, 320, 128], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, 2, 3] = 0.7
    kp3d = rng.randn(B, K, 3).astype(np.float32) * 0.1
    kp3d[..., 2] += 0.7
    batch = {
        "other_K": jnp.asarray(Kmat),
        "TCO": jnp.asarray(TCO),
        "other_keypoints_2d": jnp.asarray(rng.rand(B, K, 2) * 256, jnp.float32),
        "other_keypoints_3d": jnp.asarray(kp3d),
        "other_valid_mask_crop": jnp.ones((B, K), jnp.float32),
    }
    gt_rot = jnp.asarray(rng.randn(B, 6), jnp.float32)
    gt_pose = jnp.asarray(rng.randn(B, 6), jnp.float32)
    trans = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1 + [0, 0, 0.7])

    def loss(xyz_free):
        # the root keypoint of BOTH keypoint sets is pred_trans exactly
        xyz_fk = xyz_free.at[:, ref].set(trans)
        xyz_int = (xyz_free + 0.01).at[:, ref].set(trans)
        out = {
            "pose": gt_pose * 0.9,
            "rot": gt_rot * 0.9,
            "trans": trans,
            "root_uv": jnp.asarray(rng.rand(B, 2) * 256, jnp.float32),
            "depth": trans[:, 2:3],
            "uvd": jnp.zeros((B, K, 3)),
            "xyz_fk": xyz_fk,
            "xyz_int": xyz_int,
        }
        total, _ = L.full_net_losses(cfg, out, batch, gt_rot, gt_pose)
        return total

    xyz0 = jnp.asarray(rng.randn(B, K, 3).astype(np.float32) * 0.1 + [0, 0, 0.7])
    g = jax.grad(loss)(xyz0)
    assert np.isfinite(np.asarray(g)).all(), "align-at-root NaN regression"
