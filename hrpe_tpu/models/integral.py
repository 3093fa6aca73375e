"""Heatmap soft-argmax (integral pose) decode, TPU-first.

The reference materializes the full (B, K, D, H, W) softmax volume and
reduces it three times (lib/utils/integral.py:112-205). Here the decode is
algebraically restructured so the D*H*W softmax and the three marginal
expectations are computed from one pass over the flattened heatmap:

    softmax over N = D*H*W, then
    E[x] = sum_n p_n * (n mod W), E[y] = sum_n p_n * ((n div W) mod H),
    E[z] = sum_n p_n * (n div (W*H))

which XLA fuses into a single read of the heatmap (HBM-bandwidth-bound op:
one pass instead of the reference's four). A Pallas kernel for this decode
lives in hrpe_tpu/ops/pallas/integral_decode.py; this module is the
reference implementation and the autodiff path.

Both normalizations of the reference are covered:
  * 'softmax' (norm_heatmap_hrnet/resnet, integral.py:13-54)
  * Gumbel 'sampling' (integral.py:21-29) for stochastic decode.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..utils.transforms import uvd_to_xyz

Array = jax.Array


def heatmap_expectations(hm_flat: Array, dims: Sequence[int]) -> Array:
    """Flattened heatmaps (B, K, D*H*W) -> normalized uvd in [-0.5, 0.5].

    dims = (D, H, W). Returns (B, K, 3) ordered (u=x, v=y, d=z).
    """
    D, H, W = dims
    hm_flat = hm_flat.astype(jnp.float32)
    p = jax.nn.softmax(hm_flat, axis=-1)
    n = jnp.arange(D * H * W, dtype=jnp.float32)
    ix = jnp.mod(n, W)
    iy = jnp.mod(n // W, H)
    iz = n // (W * H)
    # single contraction (B, K, N) x (N, 3) -> (B, K, 3) rides the MXU
    coords = jnp.stack([ix, iy, iz], axis=-1)  # (N, 3)
    e = jnp.einsum("bkn,nc->bkc", p, coords)
    scale = jnp.asarray([W, H, D], jnp.float32)
    return e / scale - 0.5


def heatmap_expectations_nhwc(hm: Array, num_joints: int, depth_dim: int) -> Array:
    """NHWC conv-head output (B, H, W, K*D) -> normalized uvd (B, K, 3).

    Layout-native decode: the (k, d) split is a free last-dim reshape in
    NHWC, so — unlike the reference's reshape to (B, K, D, H, W)
    (integral.py:116-122), which materializes a full transposed copy of
    the ~2 GB heatmap volume — this version is pure reductions over the
    conv layout. Reads may be bf16; exp/accumulation are f32. The channel
    convention channel = k*D + d matches the reference.
    """
    B, H, W, KD = hm.shape
    D = depth_dim
    K = num_joints
    hm5 = hm.reshape(B, H, W, K, D)
    m = jnp.max(hm5, axis=(1, 2, 4), keepdims=True).astype(jnp.float32)
    e = jnp.exp(hm5.astype(jnp.float32) - m)  # (B, H, W, K, D)
    S = jnp.sum(e, axis=(1, 2, 4))  # (B, K)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    zs = jnp.arange(D, dtype=jnp.float32)
    Ex = jnp.einsum("bhwkd,w->bk", e, xs)
    Ey = jnp.einsum("bhwkd,h->bk", e, ys)
    Ez = jnp.einsum("bhwkd,d->bk", e, zs)
    u = Ex / (S * W)
    v = Ey / (S * H)
    d = Ez / (S * D)
    return jnp.stack([u, v, d], axis=-1) - 0.5


def gumbel_heatmap_expectations(
    hm_flat: Array, dims: Sequence[int], rng: Array, tau: float = 5.0
) -> Array:
    """Gumbel-perturbed decode (ref 'sampling' norm, integral.py:21-29)."""
    eps = jax.random.uniform(rng, hm_flat.shape, hm_flat.dtype, 1e-8, 1.0)
    g = jnp.log(-jnp.log(eps))
    return heatmap_expectations(hm_flat - g / tau, dims)


def integral_pose_decode(
    heatmap: Array,
    num_joints: int,
    depth_dim: int,
    height_dim: int,
    width_dim: int,
    K: Array,
    inv_K: Array,
    root_trans: Array,
    image_size: float,
    depth_factor: float,
    rootid: int = 0,
    fixroot: bool = False,
    norm_type: str = "softmax",
    rng: Array | None = None,
    decode_impl: str = "jnp",
):
    """Full decode: raw head output -> (pred_uvd, pred_xyz).

    `heatmap` may be NHWC (B, H, W, K*D) straight from the conv head or
    already flat (B, K, D*H*W); both reshape to the same (B, K, N) layout
    used by the reference (channel index = k * D + d, integral.py:116-122
    after its NCHW reshape).

    `decode_impl='pallas'` uses the one-HBM-pass fused kernel
    (ops/pallas/integral_decode_nhwc.py) — inference-only (no VJP),
    TPU-only; requires the NHWC layout + softmax norm.

    Ref parity: HeatmapIntegralPose.forward (integral.py:102-205) — both
    hrnet and resnet branches of the reference compute identical math for
    norm_type='softmax' (the resnet branch's extra renormalize is a no-op).
    """
    B = heatmap.shape[0]
    dims = (depth_dim, height_dim, width_dim)
    if heatmap.ndim == 4 and norm_type == "softmax" and decode_impl == "pallas":
        from ..ops.pallas.integral_decode_nhwc import (
            fused_heatmap_expectations_nhwc,
        )

        uvd = fused_heatmap_expectations_nhwc(heatmap, num_joints, depth_dim)
    elif heatmap.ndim == 4 and norm_type == "softmax":
        # layout-native fast path: no transpose of the heatmap volume
        uvd = heatmap_expectations_nhwc(heatmap, num_joints, depth_dim)
    else:
        if heatmap.ndim == 4:  # NHWC conv output
            # (B, H, W, K*D) -> (B, K, D, H, W) flat: channel = k*D + d
            hm = heatmap.reshape(B, height_dim, width_dim, num_joints, depth_dim)
            hm = hm.transpose(0, 3, 4, 1, 2).reshape(B, num_joints, -1)
        else:
            hm = heatmap.reshape(B, num_joints, -1)
        if norm_type == "softmax":
            uvd = heatmap_expectations(hm, dims)
        elif norm_type == "sampling":
            assert rng is not None
            uvd = gumbel_heatmap_expectations(hm, dims, rng)
        else:
            raise NotImplementedError(norm_type)

    if fixroot:
        # pin the reference keypoint's depth offset to zero (ref :151,194)
        uvd = uvd.at[:, rootid, 2].set(0.0)

    xyz = uvd_to_xyz(uvd, image_size, inv_K, root_trans, depth_factor)
    return uvd, xyz


def integral_joint_decode(joint_hm: Array, joint_bounds: Array) -> Array:
    """1-D soft-argmax over per-joint angle heatmaps -> angles in bounds.

    joint_hm: (B, dof, R) or NHWC (B, H, W, dof) flattened to resolution R.
    joint_bounds: (dof, 2) [lower, upper].

    Ref parity: HeatmapIntegralJoint (integral.py:211-254).
    """
    if joint_hm.ndim == 4:
        B = joint_hm.shape[0]
        dof = joint_hm.shape[-1]
        joint_hm = joint_hm.transpose(0, 3, 1, 2).reshape(B, dof, -1)
    R = joint_hm.shape[-1]
    p = jax.nn.softmax(joint_hm, axis=-1)
    idx = jnp.arange(R, dtype=joint_hm.dtype)
    coord = jnp.einsum("bdr,r->bd", p, idx) / R  # in [0, 1)
    lower = joint_bounds[:, 0]
    upper = joint_bounds[:, 1]
    return coord * (upper - lower)[None, :] + lower[None, :]
