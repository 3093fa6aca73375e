"""Pallas kernel correctness via the interpreter (CPU).

Tests run on the CPU backend, so kernels are validated in interpret mode
against the jnp reference; on TPU the same kernels lower through Mosaic
(verified on-chip: scripts/epilogue_microbench.py times the NHWC decode
kernel natively and asserts it matches the jnp path).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.models.integral import heatmap_expectations_nhwc
from hrpe_tpu.ops.pallas.integral_decode_nhwc import fused_heatmap_expectations_nhwc


def test_fused_decode_nhwc_matches_reference():
    # conv-layout decode: (B, H, W, K*D) with channel = k*D + d
    rng = np.random.RandomState(2)
    hm = jnp.asarray(rng.randn(4, 16, 16, 7 * 8).astype(np.float32) * 3)
    ref = heatmap_expectations_nhwc(hm, 7, 8)
    out = fused_heatmap_expectations_nhwc(hm, 7, 8, True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_fused_decode_nhwc_bf16_input():
    rng = np.random.RandomState(3)
    hm = jnp.asarray(rng.randn(2, 8, 8, 3 * 4) * 2, jnp.bfloat16)
    ref = heatmap_expectations_nhwc(hm, 3, 4)
    out = fused_heatmap_expectations_nhwc(hm, 3, 4, True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_fused_decode_nhwc_per_keypoint_kernel():
    # the VMEM-safe tiled variant (grid (B, K)) must match the whole-image
    # kernel and the jnp reference (ADVICE r2: large K*D shape envelope)
    import hrpe_tpu.ops.pallas.integral_decode_nhwc as m

    rng = np.random.RandomState(5)
    hm = jnp.asarray(rng.randn(3, 16, 16, 5 * 8).astype(np.float32) * 3)
    ref = heatmap_expectations_nhwc(hm, 5, 8)
    old = m._WHOLE_TILE_VMEM_BYTES
    m._WHOLE_TILE_VMEM_BYTES = 0  # force the per-keypoint kernel
    try:
        out = fused_heatmap_expectations_nhwc(hm, 5, 8, True)
    finally:
        m._WHOLE_TILE_VMEM_BYTES = old
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_fused_decode_nhwc_grad_delegates():
    # jax.grad through the pallas op must work (custom VJP defers to the
    # jnp reference instead of dying in 'no differentiation rule')
    rng = np.random.RandomState(6)
    hm = jnp.asarray(rng.randn(2, 8, 8, 3 * 4).astype(np.float32))

    g_pallas = jax.grad(
        lambda h: jnp.sum(fused_heatmap_expectations_nhwc(h, 3, 4, True) ** 2)
    )(hm)
    g_ref = jax.grad(
        lambda h: jnp.sum(heatmap_expectations_nhwc(h, 3, 4) ** 2)
    )(hm)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), atol=1e-5)


def test_full_net_pallas_decode_path():
    # decode_impl='pallas' wires through integral_pose_decode identically;
    # FORCE_INTERPRET is the supported testing hook (no monkeypatching of
    # call-time imports — ADVICE r2)
    from hrpe_tpu.models.integral import integral_pose_decode
    from hrpe_tpu.utils.geometry import inv_K

    rng = np.random.RandomState(4)
    B, K_, D, S = 2, 3, 4, 8
    hm = jnp.asarray(rng.randn(B, S, S, K_ * D).astype(np.float32))
    Kmat = jnp.tile(
        jnp.asarray([[320.0, 0, 128], [0, 320, 128], [0, 0, 1]], jnp.float32),
        (B, 1, 1),
    )
    root = jnp.tile(jnp.asarray([[0.0, 0, 1.2]], jnp.float32), (B, 1))
    args = (K_, D, S, S, Kmat, inv_K(Kmat), root, 256.0, 1.3)
    uvd_j, xyz_j = integral_pose_decode(hm, *args, decode_impl="jnp")
    import hrpe_tpu.ops.pallas.integral_decode_nhwc as m

    m.FORCE_INTERPRET = True
    try:
        uvd_p, xyz_p = integral_pose_decode(hm, *args, decode_impl="pallas")
    finally:
        m.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(uvd_j), np.asarray(uvd_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xyz_j), np.asarray(xyz_p), atol=1e-4)
