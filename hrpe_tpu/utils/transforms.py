"""Coordinate transforms between heatmap-uvd space and camera-frame xyz.

Pure-JAX, batched, fully differentiable counterparts of the reference's
lib/utils/transforms.py. All host-side asserts / NaN checks from the
reference are replaced by jit-safe math; enable `jax.config.jax_debug_nans`
for equivalent NaN surveillance (SURVEY.md §5.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import inv_K as _inv_K

Array = jax.Array


def uvd_to_xyz(
    uvd: Array,
    image_size: float,
    inv_K: Array,
    root_trans: Array,
    depth_factor: float,
    return_relative: bool = False,
) -> Array:
    """Normalized uvd (B, K, 3) in [-0.5, 0.5] -> absolute camera xyz (B, K, 3).

    u,v are remapped to input pixel space ((u+0.5)*image_size), d to meters
    (d*depth_factor), depth is made absolute by adding the root depth
    root_trans[:, 2], then back-projected through inv_K.

    Ref parity: transforms.py:33-82 (HybrIK-derived).
    """
    uv_pix = (uvd[..., :2] + 0.5) * image_size
    dz = uvd[..., 2] * depth_factor
    ones = jnp.ones_like(uv_pix[..., :1])
    uv_h = jnp.concatenate([uv_pix, ones], axis=-1)  # (B, K, 3)
    rays = jnp.einsum("bij,bkj->bki", inv_K, uv_h)  # x/z, y/z, 1
    abs_z = dz + root_trans[..., None, 2]  # (B, K)
    xyz = rays * abs_z[..., None]
    if return_relative:
        xyz = xyz - root_trans[..., None, :]
    return xyz


def xyz_to_uvd(
    xyz: Array,
    image_size: float,
    K: Array,
    root_trans: Array,
    depth_factor: float,
    return_relative: bool = False,
) -> Array:
    """Inverse of `uvd_to_xyz`. Ref parity: transforms.py:85-116."""
    if return_relative:
        xyz = xyz + root_trans[..., None, :]
    uvz = jnp.einsum("bij,bkj->bki", K, xyz)
    uv = uvz[..., :2] / uvz[..., 2:3]
    dz = xyz[..., 2] - root_trans[..., None, 2]
    return jnp.concatenate(
        [uv / image_size - 0.5, (dz / depth_factor)[..., None]], axis=-1
    )


def uvz_to_xyz_singlepoint(uv: Array, z: Array, K: Array) -> Array:
    """Back-project a single pixel + absolute depth to camera xyz.

    uv (B, 2) in pixels, z (B, 1) in meters, K (B, 3, 3) -> (B, 3).
    Ref parity: transforms.py:142-153 (`uvz2xyz_singlepoint`).
    """
    inv_k = _inv_K(K)
    xyt = jnp.concatenate([uv * z, z], axis=-1)  # (B, 3)
    return jnp.einsum("bij,bj->bi", inv_k, xyt)
