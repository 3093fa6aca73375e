"""Device-side batched flat-shaded rasterizer (JAX, jit/TPU).

The batched twin of render.shade.render_phong (same camera model,
inside test, perspective-correct 1/z depth, double-sided Lambert): used
by the synthetic-dataset generator to render domain-randomized training
frames ON the TPU — this environment's host has a single CPU core, so
the numpy scanline rasterizer (~0.5 s/frame) cannot feed a 30k-image
dataset, while the chip renders a whole batch in milliseconds.

Rasterization = a z-buffer fold over fixed-size face chunks
(`lax.fori_loop`, static shapes): each chunk evaluates barycentric
coverage + interpolated depth for all pixels (B,C,H,W), reduces over the
chunk, and min-merges into the carried z/rgb buffers. Memory is bounded
by the chunk, FLOPs are elementwise VPU work — no MXU needed, which is
fine: one 512-face robot frame is ~40 MFLOP.

Counterpart of the reference's Isaac-Sim / pyrender data renders
(ref lib/utils/urdf_robot.py:311-422); no reference code is involved —
the reference generates data with an external simulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("hw", "chunk"))
def render_flat_batch(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    K: jnp.ndarray,
    hw: tuple,
    light_dir: jnp.ndarray,
    ambient: jnp.ndarray,
    diffuse: jnp.ndarray,
    color: jnp.ndarray,
    chunk: int = 64,
):
    """Rasterize camera-frame triangle batches with flat Lambert shading.

    verts: (B, V, 3) camera-frame vertices; faces: (F, 3) int32 shared
    across the batch; K: (3, 3); hw: (H, W); light_dir: (B, 3);
    ambient/diffuse: (B,); color: (B, 3) in [0, 1].

    Returns (rgb (B, H, W, 3) float32 in [0, 255] with 0 background,
    depth (B, H, W) float32, +inf where empty).
    """
    H, W = hw
    B = verts.shape[0]
    verts = verts.astype(jnp.float32)
    K = K.astype(jnp.float32)

    tv = verts[:, faces]  # (B, F, 3, 3)
    z_ok = jnp.all(tv[..., 2] > 1e-6, axis=-1)  # (B, F)
    proj = verts @ K.T
    uv = proj[..., :2] / jnp.maximum(proj[..., 2:3], 1e-9)  # (B, V, 2)
    t_uv = uv[:, faces]  # (B, F, 3, 2)

    # flat shading per face (double-sided, like render_phong)
    n = jnp.cross(tv[:, :, 1] - tv[:, :, 0], tv[:, :, 2] - tv[:, :, 0])
    nn = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    L = light_dir / jnp.maximum(
        jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-12
    )
    lam = jnp.abs(jnp.einsum("bfc,bc->bf", nn, L))
    shade = jnp.clip(ambient[:, None] + diffuse[:, None] * lam, 0.0, 1.0)
    face_rgb = color[:, None, :] * 255.0 * shade[..., None]  # (B, F, 3)

    # barycentric edge setup per face
    p0 = t_uv[:, :, 0]  # (B, F, 2)
    e0 = t_uv[:, :, 1] - p0
    e1 = t_uv[:, :, 2] - p0
    den = e0[..., 0] * e1[..., 1] - e1[..., 0] * e0[..., 1]  # (B, F)
    den_ok = jnp.abs(den) > 1e-12
    inv_den = jnp.where(den_ok, 1.0, 0.0) / jnp.where(den_ok, den, 1.0)
    inv_z = 1.0 / jnp.maximum(tv[..., 2], 1e-9)  # (B, F, 3)
    valid = z_ok & den_ok

    F = faces.shape[0]
    n_chunks = -(-F // chunk)
    pad = n_chunks * chunk - F

    def padf(x):
        cfg = [(0, 0)] * x.ndim
        cfg[1] = (0, pad)
        return jnp.pad(x, cfg)

    p0, e0, e1 = padf(p0), padf(e0), padf(e1)
    inv_den, inv_z = padf(inv_den), padf(inv_z)
    valid, face_rgb = padf(valid), padf(face_rgb)

    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5

    def body(c, carry):
        zbuf, rgb = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, 1)
        cp0, ce0, ce1 = sl(p0), sl(e0), sl(e1)
        cid, ciz = sl(inv_den), sl(inv_z)
        cok, crgb = sl(valid), sl(face_rgb)
        # pixel-center offsets from each face's first vertex
        dx = xs[None, None, None, :] - cp0[..., 0, None, None]  # (B,C,1,W)
        dy = ys[None, None, :, None] - cp0[..., 1, None, None]  # (B,C,H,1)
        idn = cid[..., None, None]
        b1 = (dx * ce1[..., 1, None, None] - ce1[..., 0, None, None] * dy) * idn
        b2 = (ce0[..., 0, None, None] * dy - dx * ce0[..., 1, None, None]) * idn
        b0 = 1.0 - b1 - b2
        inside = (
            (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & cok[..., None, None]
        )  # (B,C,H,W)
        izp = (
            b0 * ciz[..., 0, None, None]
            + b1 * ciz[..., 1, None, None]
            + b2 * ciz[..., 2, None, None]
        )
        depth = 1.0 / jnp.maximum(izp, 1e-12)
        depth = jnp.where(inside, depth, jnp.inf)
        cz = jnp.min(depth, axis=1)  # (B,H,W)
        ci = jnp.argmin(depth, axis=1)  # (B,H,W) winning face in chunk
        ccol = jnp.take_along_axis(
            crgb[:, :, None, None, :],
            ci[:, None, ..., None].astype(jnp.int32),
            axis=1,
        )[:, 0]  # (B,H,W,3)
        better = cz < zbuf
        zbuf = jnp.where(better, cz, zbuf)
        rgb = jnp.where(better[..., None], ccol, rgb)
        return zbuf, rgb

    zbuf0 = jnp.full((B, H, W), jnp.inf, jnp.float32)
    rgb0 = jnp.zeros((B, H, W, 3), jnp.float32)
    zbuf, rgb = jax.lax.fori_loop(0, n_chunks, body, (zbuf0, rgb0))
    return rgb, zbuf


def render_flat_batch_np(verts, faces, K, hw, light_dir, ambient, diffuse,
                         color, chunk: int = 64):
    """numpy-in/numpy-out convenience wrapper."""
    rgb, depth = render_flat_batch(
        jnp.asarray(verts),
        jnp.asarray(np.asarray(faces, np.int32)),
        jnp.asarray(K),
        tuple(hw),
        jnp.asarray(light_dir),
        jnp.asarray(ambient),
        jnp.asarray(diffuse),
        jnp.asarray(color),
        chunk=chunk,
    )
    return np.asarray(rgb), np.asarray(depth)


@functools.partial(jax.jit, static_argnames=("hw", "chunk"))
def render_flat_batch_rgba(verts, faces, K, hw, light_dir, ambient, diffuse,
                           color, chunk: int = 64):
    """render_flat_batch packed to (B, H, W, 4) uint8 (alpha = coverage).

    Device->host transfer is the generator's bottleneck over the hosted
    TPU tunnel (~27 MB/s measured): f32 rgb+depth for a 64-frame block is
    75 MB ≈ 2.7 s, the uint8 pack is 19 MB ≈ 0.7 s."""
    rgb, depth = render_flat_batch(
        verts, faces, K, hw, light_dir, ambient, diffuse, color, chunk=chunk
    )
    a = jnp.where(jnp.isfinite(depth), jnp.uint8(255), jnp.uint8(0))
    return jnp.concatenate(
        [jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8), a[..., None]],
        axis=-1,
    )
