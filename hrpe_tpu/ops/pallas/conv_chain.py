"""Pallas TPU kernel: fused int8 residual-block chains (serving path).

Round-2 profiling (scripts/epilogue_microbench.py, hrnet_microbench.py)
showed the int8 serving path spends more time in requantize HBM
round-trips than in conv math: XLA materializes every conv's int32/f32
output to HBM, reads it back for the dequant+BN+ReLU+requant epilogue,
and writes the int8 result — ~4 HBM passes per conv where one int8 read
and one int8 write per BLOCK CHAIN suffice.

This kernel runs a whole chain of residual blocks (the per-branch
BasicBlock x4 stack of an HRNet HighResolutionModule, ref
lib/models/backbones/HRnet.py:101-185) inside one pallas_call:

  per image (grid (B,)):
    q               : (HW, C) int8 activation, VMEM-resident throughout
    for each block  : d1 = conv3x3(q, W1)            # int8 x int8 -> int32
                      q1 = clip(round(relu(d1*a1+b1)))       # folded
                      d2 = conv3x3(q1, W2)
                      q  = clip(round(relu(d2*a2+b2 + q*r))) # residual
    out             : (HW, C) int8

The 3x3 conv is expressed as one MXU contraction (HW, 9C) x (9C, C):
the nine taps are circular row-rolls of the flat (HW, C) activation with
edge masks (SAME zero padding), concatenated along the lane axis —
everything stays in VMEM.

All scale folding happens OUTSIDE the kernel (tiny XLA ops on (C,)
vectors): a1 = s_in*sw1*bn_gamma1/sqrt(var1+eps)/s_mid etc., so the
kernel sees exactly five f32 vectors per block. Per-channel weight
scales and the ops/quant.py rounding convention (round-half-even, clip
to [-127, 127]) are preserved; glue math is f32 (the XLA path's bf16
glue casts are a performance artifact, not semantics — fidelity is
gated against the bf16 model in bench.py).

Inference-only: raises under differentiation (the int8 path itself is
inference-only by construction).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# testing hook: force interpreter mode (read at trace time)
FORCE_INTERPRET = False


def _tap_masks(H: int, W: int) -> np.ndarray:
    """(9, HW, 1) validity masks for the 3x3 taps (dy, dx) row-major."""
    hw = np.arange(H * W)
    h, w = hw // W, hw % W
    masks = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ok = (h + dy >= 0) & (h + dy < H) & (w + dx >= 0) & (w + dx < W)
            masks.append(ok)
    return np.stack(masks, 0)[:, :, None]  # (9, HW, 1)


def _conv3x3_cat(q, H, W):
    """Build the (HW, 9C) im2col of a flat (HW, C) int8 activation using
    circular rolls + edge masks (zero SAME padding). Masks are computed
    in-register from iota (no constant capture, no HBM traffic)."""
    HW = H * W
    hw = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)
    h = hw // W
    w = hw - h * W
    views = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            off = dy * W + dx
            # pltpu.roll requires a non-negative shift; -off mod HW is the
            # same circular rotation (edge wrap is masked out anyway)
            v = pltpu.roll(q, (-off) % HW, 0) if off else q
            ok = (
                (h + dy >= 0) & (h + dy < H) & (w + dx >= 0) & (w + dx < W)
            )
            views.append(jnp.where(ok, v, jnp.zeros_like(v)))
    return jnp.concatenate(views, axis=1)  # (HW, 9C)


def _requant(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def _make_chain_kernel(n_blocks: int, H: int, W: int, C: int):
    def kernel(xq_ref, w_ref, s_ref, out_ref):
        # xq_ref: (1, HW, C) int8; w_ref: (nblk, 2, 9C, C) int8;
        # s_ref: (nblk, 5, C) f32 rows [a1, b1, a2, b2, r]; out: (1, HW, C)
        q = xq_ref[0]  # (HW, C) int8
        for i in range(n_blocks):
            cat = _conv3x3_cat(q, H, W)
            d1 = jax.lax.dot_general(
                cat, w_ref[i, 0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            q1 = _requant(jnp.maximum(d1 * s_ref[i, 0] + s_ref[i, 1], 0.0))
            cat1 = _conv3x3_cat(q1, H, W)
            d2 = jax.lax.dot_general(
                cat1, w_ref[i, 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            o = jnp.maximum(
                d2 * s_ref[i, 2] + s_ref[i, 3]
                + q.astype(jnp.float32) * s_ref[i, 4],
                0.0,
            )
            q = _requant(o)
        out_ref[0] = q

    return kernel


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def basicblock_chain_int8(
    xq: jax.Array,
    weights: jax.Array,
    scales: jax.Array,
    height: int,
    width: int,
    interpret: bool = False,
) -> jax.Array:
    """Run a chain of int8 BasicBlocks fully inside VMEM.

    xq      : (B, HW, C) int8 — flat NHWC activations (HW = height*width)
    weights : (n_blocks, 2, 9C, C) int8 — conv1/conv2 kernels, im2col
              layout (tap-major: (ky, kx, cin) flattened row-major)
    scales  : (n_blocks, 5, C) f32 — folded rows [a1, b1, a2, b2, r]:
                q1 = rq(relu(conv(q, W1)*a1 + b1))
                q' = rq(relu(conv(q1, W2)*a2 + b2 + q*r))
    returns : (B, HW, C) int8
    """
    B, HW, C = xq.shape
    n_blocks = weights.shape[0]
    assert HW == height * width, (HW, height, width)
    assert weights.shape == (n_blocks, 2, 9 * C, C), weights.shape
    assert scales.shape == (n_blocks, 5, C), scales.shape
    return pl.pallas_call(
        _make_chain_kernel(n_blocks, height, width, C),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), jnp.int8),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 2, 9 * C, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 5, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret) or FORCE_INTERPRET,
    )(xq, weights, scales)


# ---------------------------------------------------------------------------
# scale folding: flax block specs -> kernel operands
# ---------------------------------------------------------------------------

def fold_basicblock_chain(specs: Sequence[dict], s_in: jax.Array):
    """Fold a list of BasicBlock serving specs into kernel operands.

    Each spec (from BasicBlock.__call__ on a SpecRequest) carries:
      conv1/conv2 : ConvSpec (wq (3,3,C,C) int8, sw (C,))
      bn1/bn2     : (A, B) per-channel affine of the BN at serving time
      s_mid       : requant scale after conv1's BN+ReLU
      s_out       : requant scale after the residual ReLU

    Returns (weights (nblk, 2, 9C, C) int8, scales (nblk, 5, C) f32,
    s_out_last) matching basicblock_chain_int8's contract. The running
    input scale of block i is block i-1's s_out (s_in for block 0) —
    exactly how QTensors pipeline scales through the unfused int8 path.
    """
    ws, ss = [], []
    s = s_in
    for sp in specs:
        C = sp["conv1"].wq.shape[-1]
        w1 = sp["conv1"].wq.reshape(9 * C, C)
        w2 = sp["conv2"].wq.reshape(9 * C, C)
        A1, B1 = sp["bn1"]
        A2, B2 = sp["bn2"]
        s_mid, s_out = sp["s_mid"], sp["s_out"]
        a1 = s * sp["conv1"].sw * A1 / s_mid
        b1 = jnp.broadcast_to(B1 / s_mid, (C,))
        a2 = s_mid * sp["conv2"].sw * A2 / s_out
        b2 = jnp.broadcast_to(B2 / s_out, (C,))
        r = jnp.broadcast_to(s / s_out, (C,))
        ws.append(jnp.stack([w1, w2], 0))
        ss.append(jnp.stack([a1, b1, a2, b2, r], 0).astype(jnp.float32))
        s = s_out
    return jnp.stack(ws, 0), jnp.stack(ss, 0), s


# ---------------------------------------------------------------------------
# jnp reference (same math, XLA ops) — correctness oracle for tests and the
# CPU fallback when Mosaic is unavailable.
# ---------------------------------------------------------------------------

def basicblock_chain_ref(xq, weights, scales, height, width):
    """Pure-jnp twin of basicblock_chain_int8 (identical f32 math)."""
    B, HW, C = xq.shape
    n_blocks = weights.shape[0]
    masks = jnp.asarray(_tap_masks(height, width))  # (9, HW, 1)

    def cat9(q):  # (B, HW, C) -> (B, HW, 9C)
        views = []
        t = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                off = dy * width + dx
                v = jnp.roll(q, -off, axis=1) if off else q
                views.append(jnp.where(masks[t][None], v, jnp.zeros_like(v)))
                t += 1
        return jnp.concatenate(views, axis=2)

    q = xq
    for i in range(n_blocks):
        d1 = jnp.einsum(
            "bnc,co->bno", cat9(q).astype(jnp.int32), weights[i, 0].astype(jnp.int32)
        ).astype(jnp.float32)
        q1 = jnp.clip(
            jnp.round(jnp.maximum(d1 * scales[i, 0] + scales[i, 1], 0.0)),
            -127, 127,
        ).astype(jnp.int8)
        d2 = jnp.einsum(
            "bnc,co->bno", cat9(q1).astype(jnp.int32), weights[i, 1].astype(jnp.int32)
        ).astype(jnp.float32)
        o = jnp.maximum(
            d2 * scales[i, 2] + scales[i, 3] + q.astype(jnp.float32) * scales[i, 4],
            0.0,
        )
        q = jnp.clip(jnp.round(o), -127, 127).astype(jnp.int8)
    return q
