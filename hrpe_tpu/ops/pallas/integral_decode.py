"""Pallas TPU kernel: fused heatmap softmax-expectation decode.

The integral decode (models/integral.py `heatmap_expectations`) is the
hottest non-conv op in the forward pass: softmax over N = D*H*W (= 262144
at 64^3) per keypoint followed by three coordinate expectations. The
stock XLA lowering reads the heatmap from HBM for the softmax max-pass,
the exp/sum pass, and the expectation contraction; this kernel does ONE
HBM read per row — max, exp-sum and the three weighted coordinate sums are
computed in a single VMEM-resident pass (a row at 64^3 f32 is 1 MB,
comfortably inside the ~16 MB VMEM budget).

Grid: one program per (batch, keypoint) row. Inside: VPU reductions plus
an (N x 4) coordinate-matrix contraction. Falls back to the jnp reference
implementation on non-TPU backends (interpret mode in tests).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROW_TILE = 8  # sublane multiple


def _decode_kernel(hm_ref, coords_ref, out_ref):
    """hm_ref: (8, N); coords_ref: (N, 4) [ix iy iz 1]; out_ref: (8, 4)."""
    rows = hm_ref[:, :]
    m = jnp.max(rows, axis=-1, keepdims=True)
    e = jnp.exp(rows - m)  # (8, N)
    # one MXU contraction per tile: [sum(e*ix), sum(e*iy), sum(e*iz), sum(e)]
    out_ref[:, :] = jnp.dot(
        e, coords_ref[:, :], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def fused_heatmap_expectations(
    hm_flat: jax.Array, dims: Sequence[int], interpret: bool = False
) -> jax.Array:
    """(B, K, N) flattened heatmaps -> normalized uvd (B, K, 3) in [-0.5, 0.5].

    Numerically identical to models.integral.heatmap_expectations (softmax
    + expectation), fused into a single pass. `interpret=True` runs the
    kernel through the Pallas interpreter (CPU tests; also the fallback
    where the TPU runtime cannot compile Mosaic kernels).
    """
    D, H, W = dims
    B, K, N = hm_flat.shape
    assert N == D * H * W

    n = jnp.arange(N, dtype=jnp.float32)
    coords = jnp.stack(
        [jnp.mod(n, W), jnp.mod(n // W, H), n // (W * H), jnp.ones_like(n)],
        axis=-1,
    )  # (N, 4)

    rows = hm_flat.reshape(B * K, N).astype(jnp.float32)
    n_rows = B * K
    pad = (-n_rows) % _ROW_TILE
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, N), jnp.float32)], axis=0
        )
    sums = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], 4), jnp.float32),
        grid=(rows.shape[0] // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, coords)[:n_rows]

    e = sums[:, :3] / jnp.maximum(sums[:, 3:4], 1e-30)
    scale = jnp.asarray([W, H, D], jnp.float32)
    return (e / scale - 0.5).reshape(B, K, 3)
