"""Differentiable soft silhouette rasterizer, pure JAX (SoftRas-style).

Replaces pytorch3d's C++/CUDA rasterizer + SoftSilhouetteShader
(lib/utils/mesh_renderer.py:146-161: BlendParams(sigma=gamma=1e-8),
faces_per_pixel=100) with a TPU-friendly formulation: instead of per-pixel
face lists (data-dependent gather), every (pixel, face) pair contributes a
sigmoid coverage probability, aggregated in log-space over face chunks via
lax.scan — constant memory, fully differentiable, one fused XLA loop:

    alpha(p) = 1 - prod_f (1 - sigmoid(sign_f(p) * d2_f(p) / sigma))

where d2 is the squared 2D distance (in NDC units, matching pytorch3d's
convention) from pixel p to the projected triangle boundary and sign is
+1 inside / -1 outside. For sigma -> 0 this converges to the hard
silhouette; the gradient w.r.t. vertices flows through the distances.

Faces behind the camera are masked out. Z-buffering is not needed for
silhouettes (the union of coverage is depth-independent).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _point_segment_dist2(p, a, b):
    """Squared distance from points p (P,2) to segment ab ((2,), (2,))."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab), 1e-12)
    t = jnp.clip(jnp.einsum("pd,d->p", p - a, ab) / denom, 0.0, 1.0)
    proj = a[None] + t[:, None] * ab[None]
    d = p - proj
    return jnp.sum(d * d, axis=-1)


def _face_coverage(pix, tri, z_ok, sigma):
    """Soft coverage of one triangle over all pixels.

    pix: (P, 2) pixel centers (NDC); tri: (3, 2) projected verts (NDC);
    z_ok: scalar bool. Returns log(1 - prob) per pixel (P,).
    """
    a, b, c = tri[0], tri[1], tri[2]
    # inside test: consistent sign of the three edge cross products
    def cross(o, e, p):
        return (e[0] - o[0]) * (p[:, 1] - o[1]) - (e[1] - o[1]) * (p[:, 0] - o[0])

    c1 = cross(a, b, pix)
    c2 = cross(b, c, pix)
    c3 = cross(c, a, pix)
    inside = ((c1 >= 0) & (c2 >= 0) & (c3 >= 0)) | ((c1 <= 0) & (c2 <= 0) & (c3 <= 0))
    d2 = jnp.minimum(
        _point_segment_dist2(pix, a, b),
        jnp.minimum(_point_segment_dist2(pix, b, c), _point_segment_dist2(pix, c, a)),
    )
    sign = jnp.where(inside, 1.0, -1.0)
    prob = jax.nn.sigmoid(sign * d2 / sigma)
    prob = jnp.where(z_ok, prob, 0.0)
    # log(1-p), clamped for stability at p -> 1
    return jnp.log(jnp.maximum(1.0 - prob, 1e-7))


def project_to_ndc(verts_cam: Array, K: Array, image_hw: Tuple[int, int]):
    """Camera-frame verts -> (uv_ndc (V,2), z (V,)).

    NDC convention matches pytorch3d: scale by 2/min(H, W) about the image
    center so distances are comparable with its sigma units.
    """
    H, W = image_hw
    z = verts_cam[..., 2]
    zc = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[0, 0] * verts_cam[..., 0] / zc + K[0, 2]
    v = K[1, 1] * verts_cam[..., 1] / zc + K[1, 2]
    s = 2.0 / min(H, W)
    return jnp.stack([(u - W / 2) * s, (v - H / 2) * s], axis=-1), z


@functools.partial(jax.jit, static_argnames=("image_hw", "chunk"))
def soft_silhouette(
    verts_cam: Array,
    faces: Array,
    K: Array,
    image_hw: Tuple[int, int],
    sigma: float = 1e-4,
    chunk: int = 128,
) -> Array:
    """Render a soft silhouette mask (H, W) in [0, 1].

    verts_cam: (V, 3) camera-frame vertices; faces: (F, 3) int32; K: (3,3).
    `chunk` bounds the (pixels x faces) working set; the scan accumulates
    log(1-alpha) so memory is O(H*W*chunk) regardless of face count.
    """
    H, W = image_hw
    uv, z = project_to_ndc(verts_cam, K, image_hw)
    tri_uv = uv[faces]  # (F, 3, 2)
    tri_ok = jnp.all(z[faces] > 1e-4, axis=-1)  # (F,)

    s = 2.0 / min(H, W)
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5 - H / 2) * s
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5 - W / 2) * s
    gx, gy = jnp.meshgrid(xs, ys)
    pix = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (P, 2)

    F = tri_uv.shape[0]
    pad = (-F) % chunk
    tri_uv = jnp.concatenate(
        [tri_uv, jnp.zeros((pad, 3, 2), tri_uv.dtype)], axis=0
    )
    tri_ok = jnp.concatenate([tri_ok, jnp.zeros((pad,), bool)], axis=0)
    n_chunks = tri_uv.shape[0] // chunk
    tri_uv = tri_uv.reshape(n_chunks, chunk, 3, 2)
    tri_ok = tri_ok.reshape(n_chunks, chunk)

    # remat: without it the scan's backward saves the (pixels x chunk)
    # coverage tensor for EVERY chunk step — O(pixels x total_faces) HBM
    # (OOMs the sim2real step); recomputing coverage in the backward keeps
    # memory at O(pixels x chunk)
    @jax.checkpoint
    def body(acc, args):
        tris, oks = args
        logs = jax.vmap(lambda t, ok: _face_coverage(pix, t, ok, sigma))(tris, oks)
        return acc + jnp.sum(logs, axis=0), None

    log_keep, _ = jax.lax.scan(
        body, jnp.zeros((H * W,), jnp.float32), (tri_uv, tri_ok)
    )
    alpha = 1.0 - jnp.exp(log_keep)
    return alpha.reshape(H, W)


def soft_silhouette_batch(
    verts_cam: Array, faces: Array, K: Array, image_hw, sigma: float = 1e-4,
    chunk: int = 128,
) -> Array:
    """vmapped over a batch of vertex sets (B, V, 3) -> (B, H, W)."""
    return jax.vmap(
        lambda v: soft_silhouette(v, faces, K, image_hw, sigma, chunk)
    )(verts_cam)
