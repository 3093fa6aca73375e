"""Pallas TPU kernel: layout-native (NHWC) fused integral-pose decode.

The regression head emits 3D heatmaps in conv layout (B, H, W, K*D) —
~0.9 GB bf16 at batch 256 / 64^3 / 7 keypoints. The decode (softmax over
(H, W, D) per keypoint, then coordinate expectations; reference
lib/utils/integral.py:112-205) is HBM-bandwidth-bound: the stock XLA
lowering of models/integral.py:heatmap_expectations_nhwc reads that
volume once for the max pass and again for each fused reduction group.

This kernel performs the WHOLE decode in one HBM pass: each grid program
loads one image's heatmap tile (H*W, K*D) into VMEM and produces the
per-keypoint sums

    S_k  = sum_{h,w,d} e               Ez_k = sum e * d
    Ex_k = sum e * w                   Ey_k = sum e * h
    with e = exp(hm - max_k hm)

via two tiny MXU contractions (row-weight and column-weight matrices);
u/v/d normalization happens outside on (B, K) scalars. Numerics match
heatmap_expectations_nhwc (same channel convention c = k*D + d, f32
accumulation); tests/test_pallas_ops.py asserts equality and the full-net
serving path uses it via models/integral.py (decode_impl='pallas').

The kernel is inference-only (no custom VJP); training keeps the jnp
reference implementation, whose gradient XLA fuses adequately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(K: int, D: int):
    def kernel(hm_ref, rows_ref, cols_ref, out_ref):
        """hm_ref: (1, HW, K*D); rows_ref: (HW, 4) [1 h w pad];
        cols_ref: (K*D, 2K) [block one-hot | d * block one-hot];
        out_ref: (1, 8, 2K) rows [S-group | Ez-group] x weight index."""
        x = hm_ref[0].astype(jnp.float32)  # (HW, KD)
        # per-keypoint max over the k-th 64-column block (static unroll)
        colmax = jnp.max(x, axis=0, keepdims=True)  # (1, KD)
        parts = []
        for k in range(K):
            mk = jnp.max(colmax[:, k * D : (k + 1) * D])
            parts.append(jnp.full((1, D), mk, jnp.float32))
        mrow = jnp.concatenate(parts, axis=1)  # (1, KD)
        e = jnp.exp(x - mrow)  # (HW, KD)
        # A[c, j] = sum_r rows[r, j] * e[r, c]   (contraction over HW)
        a = jax.lax.dot_general(
            e, rows_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (KD, 4)
        # out[j, m] = sum_c A[c, j] * cols[c, m]  (contraction over KD)
        o = jax.lax.dot_general(
            a, cols_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4, 2K)
        out_ref[0, :4, :] = o
        out_ref[0, 4:, :] = jnp.zeros((4, 2 * K), jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_joints", "depth_dim", "interpret")
)
def fused_heatmap_expectations_nhwc(
    hm: jax.Array, num_joints: int, depth_dim: int, interpret: bool = False
) -> jax.Array:
    """NHWC head output (B, H, W, K*D) -> normalized uvd (B, K, 3).

    One-HBM-pass twin of models.integral.heatmap_expectations_nhwc
    (channel = k * D + d, matching the reference's NCHW reshape,
    lib/utils/integral.py:116-122).
    """
    B, H, W, KD = hm.shape
    K, D = num_joints, depth_dim
    assert KD == K * D, (KD, K, D)
    HW = H * W

    # row-weight matrix [1, h, w, 0] and column-weight matrix
    # [block one-hot | d * block one-hot], built host-side (constants)
    r = np.arange(HW)
    rows = np.stack(
        [np.ones(HW), r // W, r % W, np.zeros(HW)], axis=1
    ).astype(np.float32)  # (HW, 4)
    c = np.arange(KD)
    blk = (c // D)[:, None] == np.arange(K)[None, :]  # (KD, K)
    cols = np.concatenate(
        [blk.astype(np.float32), (c % D)[:, None] * blk.astype(np.float32)],
        axis=1,
    )  # (KD, 2K)

    out = pl.pallas_call(
        _make_kernel(K, D),
        out_shape=jax.ShapeDtypeStruct((B, 8, 2 * K), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, KD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KD, 2 * K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 2 * K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hm.reshape(B, HW, KD), jnp.asarray(rows), jnp.asarray(cols))

    s = jnp.maximum(out[:, 0, :K], 1e-30)  # (B, K)
    ey = out[:, 1, :K]
    ex = out[:, 2, :K]
    ez = out[:, 0, K:]
    u = ex / (s * W)
    v = ey / (s * H)
    d = ez / (s * D)
    return jnp.stack([u, v, d], axis=-1) - 0.5
