"""Integral decode tests: layout equivalence, fixroot, joint decode."""

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.models.integral import (
    heatmap_expectations,
    heatmap_expectations_nhwc,
    integral_joint_decode,
    integral_pose_decode,
)
from hrpe_tpu.utils.geometry import inv_K


def test_nhwc_decode_matches_transpose_path():
    rng = np.random.RandomState(0)
    B, H, W, K, D = 2, 8, 8, 5, 4
    hm = jnp.asarray(rng.randn(B, H, W, K * D).astype(np.float32) * 2)
    # reference path: transpose to (B, K, D*H*W)
    hm5 = hm.reshape(B, H, W, K, D).transpose(0, 3, 4, 1, 2).reshape(B, K, -1)
    ref = heatmap_expectations(hm5, (D, H, W))
    out = heatmap_expectations_nhwc(hm, K, D)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_decode_peak_location():
    # a delta peak at (x=6, y=2, d=1) must decode to those coordinates
    B, H, W, K, D = 1, 8, 8, 1, 4
    hm = np.full((B, H, W, K * D), -20.0, np.float32)
    hm[0, 2, 6, 0 * D + 1] = 20.0
    uvd = np.asarray(heatmap_expectations_nhwc(jnp.asarray(hm), K, D))[0, 0]
    np.testing.assert_allclose(uvd[0], 6 / W - 0.5, atol=1e-3)
    np.testing.assert_allclose(uvd[1], 2 / H - 0.5, atol=1e-3)
    np.testing.assert_allclose(uvd[2], 1 / D - 0.5, atol=1e-3)


def test_full_decode_fixroot_and_xyz():
    rng = np.random.RandomState(1)
    B, S, K_n, D = 2, 8, 3, 4
    hm = jnp.asarray(rng.randn(B, S, S, K_n * D).astype(np.float32))
    Kmat = jnp.tile(
        jnp.asarray([[100.0, 0, 16.0], [0, 100.0, 16.0], [0, 0, 1.0]]), (B, 1, 1)
    )
    root_trans = jnp.asarray([[0, 0, 1.0], [0, 0, 1.5]], jnp.float32)
    uvd, xyz = integral_pose_decode(
        hm, K_n, D, S, S, Kmat, inv_K(Kmat), root_trans, 32.0, 1.3,
        rootid=1, fixroot=True,
    )
    assert uvd.shape == (B, K_n, 3) and xyz.shape == (B, K_n, 3)
    np.testing.assert_allclose(np.asarray(uvd[:, 1, 2]), 0.0, atol=1e-7)
    # root keypoint depth equals the injected root depth
    np.testing.assert_allclose(
        np.asarray(xyz[:, 1, 2]), np.asarray(root_trans[:, 2]), atol=1e-5
    )


def test_gumbel_sampling_decode():
    # stochastic decode (ref 'sampling' norm): finite, in range, and
    # converging to the softmax decode as tau -> large effective scale
    from hrpe_tpu.models.integral import gumbel_heatmap_expectations

    rng = np.random.RandomState(3)
    hm = jnp.asarray(rng.randn(2, 3, 4 * 4 * 4).astype(np.float32) * 5)
    out = gumbel_heatmap_expectations(hm, (4, 4, 4), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    assert (np.abs(np.asarray(out)) <= 0.5 + 1e-6).all()
    # two different rngs give different (stochastic) decodes
    out2 = gumbel_heatmap_expectations(hm, (4, 4, 4), jax.random.PRNGKey(1))
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_joint_decode_bounds():
    rng = np.random.RandomState(2)
    hm = jnp.asarray(rng.randn(4, 6, 32).astype(np.float32) * 3)
    bounds = jnp.asarray(
        np.stack([np.full(6, -1.5), np.full(6, 2.0)], axis=-1), jnp.float32
    )
    joints = np.asarray(integral_joint_decode(hm, bounds))
    assert joints.shape == (4, 6)
    assert (joints >= -1.5).all() and (joints <= 2.0).all()
