"""Pallas TPU kernel: layout-native (NHWC) fused integral-pose decode.

The regression head emits 3D heatmaps in conv layout (B, H, W, K*D) —
~0.9 GB bf16 at batch 256 / 64^3 / 7 keypoints. The decode (softmax over
(H, W, D) per keypoint, then coordinate expectations; reference
lib/utils/integral.py:112-205) is HBM-bandwidth-bound: the stock XLA
lowering of models/integral.py:heatmap_expectations_nhwc reads that
volume once for the max pass and again for each fused reduction group.

Two kernels perform the WHOLE decode in one HBM pass:

  * whole-image kernel (grid (B,)): loads one image's (H*W, K*D) tile
    into VMEM, one MXU contraction against a [1, h, w] row-weight matrix
    plus a per-keypoint block matrix. Fastest when the tile + two f32
    temporaries fit VMEM.
  * per-keypoint kernel (grid (B, K)): loads one keypoint's (H*W, D)
    slab at a time (~10x smaller), so arbitrarily large K*D stays inside
    the VMEM budget. Selected automatically above _WHOLE_TILE_VMEM_BYTES.

Numerics match heatmap_expectations_nhwc (channel c = k*D + d, f32
accumulation); tests/test_pallas_ops.py asserts equality and the full-net
serving path uses it via models/integral.py (decode_impl='pallas').

Differentiation: the op carries a custom VJP whose backward pass defers
to the jnp reference implementation (one recompute), so reaching this op
under jax.grad works instead of dying in 'no differentiation rule for
pallas_call'; training still uses decode_impl='jnp' directly.

Testing hook: set module-level FORCE_INTERPRET = True to run the kernels
in interpreter mode regardless of caller flags (used by tests on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# testing hook: force interpreter mode (read at trace time)
FORCE_INTERPRET = False

# above this estimated VMEM footprint the whole-image kernel risks Mosaic
# compile failure on 16 MB-VMEM parts; switch to the per-keypoint kernel
_WHOLE_TILE_VMEM_BYTES = 24 * 1024 * 1024


def _make_whole_kernel(K: int, D: int):
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


def _make_per_k_kernel(D: int):
    def kernel(hm_ref, rows_ref, out_ref):
        """hm_ref: (1, HW, 1, D) one keypoint's slab; rows_ref: (HW, 4);
        out_ref: (1, 1, 8) = [S, Ey, Ex, Ez, 0, 0, 0, 0]."""
        x = hm_ref[0, :, 0, :].astype(jnp.float32)  # (HW, D)
        m = jnp.max(x)
        e = jnp.exp(x - m)  # (HW, D)
        a = jax.lax.dot_general(
            e, rows_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, 4): [S_d, Ey_d, Ex_d, pad]
        d_idx = jax.lax.broadcasted_iota(jnp.float32, (D, 1), 0)
        S = jnp.sum(a[:, 0:1])
        Ey = jnp.sum(a[:, 1:2])
        Ex = jnp.sum(a[:, 2:3])
        Ez = jnp.sum(a[:, 0:1] * d_idx)
        row = jnp.concatenate(
            [
                jnp.reshape(S, (1, 1)), jnp.reshape(Ey, (1, 1)),
                jnp.reshape(Ex, (1, 1)), jnp.reshape(Ez, (1, 1)),
                jnp.zeros((1, 4), jnp.float32),
            ],
            axis=1,
        )  # (1, 8)
        out_ref[0] = row

    return kernel


def _rows_matrix(H: int, W: int) -> np.ndarray:
    r = np.arange(H * W)
    return np.stack(
        [np.ones(H * W), r // W, r % W, np.zeros(H * W)], axis=1
    ).astype(np.float32)  # (HW, 4)


def _decode_whole(hm, K, D, interpret):
    B, H, W, KD = hm.shape
    HW = H * W
    c = np.arange(KD)
    blk = (c // D)[:, None] == np.arange(K)[None, :]  # (KD, K)
    cols = np.concatenate(
        [blk.astype(np.float32), (c % D)[:, None] * blk.astype(np.float32)],
        axis=1,
    )  # (KD, 2K)
    out = pl.pallas_call(
        _make_whole_kernel(K, D),
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
    )(hm.reshape(B, HW, KD), jnp.asarray(_rows_matrix(H, W)), jnp.asarray(cols))
    s = jnp.maximum(out[:, 0, :K], 1e-30)  # (B, K)
    ey = out[:, 1, :K]
    ex = out[:, 2, :K]
    ez = out[:, 0, K:]
    return s, ey, ex, ez


def _decode_per_k(hm, K, D, interpret):
    B, H, W, KD = hm.shape
    HW = H * W
    out = pl.pallas_call(
        _make_per_k_kernel(D),
        out_shape=jax.ShapeDtypeStruct((B, K, 8), jnp.float32),
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, HW, 1, D), lambda i, k: (i, 0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, 4), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hm.reshape(B, HW, K, D), jnp.asarray(_rows_matrix(H, W)))
    s = jnp.maximum(out[:, :, 0], 1e-30)
    ey = out[:, :, 1]
    ex = out[:, :, 2]
    ez = out[:, :, 3]
    return s, ey, ex, ez


def _fused_impl(hm, num_joints, depth_dim, interpret):
    B, H, W, KD = hm.shape
    K, D = num_joints, depth_dim
    assert KD == K * D, (KD, K, D)
    interpret = bool(interpret) or FORCE_INTERPRET
    vmem_est = H * W * KD * (hm.dtype.itemsize + 8)  # tile + x/e f32 temps
    if vmem_est <= _WHOLE_TILE_VMEM_BYTES:
        s, ey, ex, ez = _decode_whole(hm, K, D, interpret)
    else:
        s, ey, ex, ez = _decode_per_k(hm, K, D, interpret)
    u = ex / (s * W)
    v = ey / (s * H)
    d = ez / (s * D)
    return jnp.stack([u, v, d], axis=-1) - 0.5


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_heatmap_expectations_nhwc(
    hm: jax.Array, num_joints: int, depth_dim: int, interpret: bool = False
) -> jax.Array:
    """NHWC head output (B, H, W, K*D) -> normalized uvd (B, K, 3).

    One-HBM-pass twin of models.integral.heatmap_expectations_nhwc
    (channel = k * D + d, matching the reference's NCHW reshape,
    lib/utils/integral.py:116-122). Differentiable: the VJP recomputes
    through the jnp reference (one extra forward) — intended for the odd
    eval-inside-optimization caller; training paths use the jnp impl.
    """
    return _fused_impl(hm, num_joints, depth_dim, interpret)


def _fused_fwd(hm, num_joints, depth_dim, interpret):
    return _fused_impl(hm, num_joints, depth_dim, interpret), hm


def _fused_bwd(num_joints, depth_dim, interpret, hm, g):
    from ...models.integral import heatmap_expectations_nhwc

    _, vjp = jax.vjp(
        lambda h: heatmap_expectations_nhwc(h, num_joints, depth_dim), hm
    )
    return (vjp(g)[0],)


fused_heatmap_expectations_nhwc.defvjp(_fused_fwd, _fused_bwd)
