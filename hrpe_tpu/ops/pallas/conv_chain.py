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
            # static circular rotation by -off rows (edge wrap is masked
            # out anyway). Expressed as slice+concat, NOT pltpu.roll:
            # Mosaic lowers roll to tpu.dynamic_rotate, which is
            # unimplemented for int8 vectors ("Rotate with non-32-bit
            # data"); static slices compile and are exact.
            m = off % HW
            v = jnp.concatenate([q[m:], q[:m]], 0) if off else q
            ok = (
                (h + dy >= 0) & (h + dy < H) & (w + dx >= 0) & (w + dx < W)
            )
            views.append(jnp.where(ok, v, jnp.zeros_like(v)))
    return jnp.concatenate(views, axis=1)  # (HW, 9C)


def _requant(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def _dot_i8(x, w):
    """int8 x int8 -> int32 MXU contraction.

    precision must be DEFAULT explicitly: the package __init__ sets
    jax_default_matmul_precision='highest' (f32 geometry math), which
    stamps contract_precision<fp32> onto integer tpu.matmul ops and
    Mosaic rejects them with 'Bad lhs type'."""
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _make_chain_kernel(n_blocks: int, H: int, W: int, C: int):
    def kernel(xq_ref, w_ref, s_ref, out_ref):
        # xq_ref: (1, HW, C) int8; w_ref: (nblk, 2, 9C, C) int8;
        # s_ref: (nblk, 5, C) f32 rows [a1, b1, a2, b2, r]; out: (1, HW, C)
        q = xq_ref[0]  # (HW, C) int8
        for i in range(n_blocks):
            cat = _conv3x3_cat(q, H, W)
            d1 = _dot_i8(cat, w_ref[i, 0]).astype(jnp.float32)
            q1 = _requant(jnp.maximum(d1 * s_ref[i, 0] + s_ref[i, 1], 0.0))
            cat1 = _conv3x3_cat(q1, H, W)
            d2 = _dot_i8(cat1, w_ref[i, 1]).astype(jnp.float32)
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
# Bottleneck chains (ResNet-50/101/152 stages + HRNet stem layer1)
# ---------------------------------------------------------------------------
#
# Per block: 1x1 (Cin->P) +BN+ReLU+rq, 3x3 stride s (P->P) +BN+ReLU+rq,
# 1x1 (P->4P) +BN, residual (1x1 stride-s projection on the first block,
# identity otherwise), ReLU+rq. Only the first block of a stage may have
# stride 2 / a projection (ref lib/models/backbones/Resnet.py:5-68).
# Heterogeneous weight shapes (block 0's Cin differs) are passed as
# separate pallas inputs; scales are packed into one (nblk, 8, 4P) array
# rows [a1 b1 a2 b2 a3 b3 ap bp] (P-wide rows zero-padded to 4P; for
# identity-residual blocks row 6 carries the broadcast s_in/s_out).


def _subsample2(x, H, W):
    """(HW, C) -> (HW/4, C): keep even rows/cols (stride-2, SAME pad,
    kernel anchored at top-left after the 3x3 halo is applied)."""
    C = x.shape[-1]
    return x.reshape(H // 2, 2, W // 2, 2, C)[:, 0, :, 0, :].reshape(
        (H // 2) * (W // 2), C
    )


def _make_bottleneck_kernel(meta, H: int, W: int, stride: int):
    """meta: per-block dicts {P, cin, has_proj} (static)."""

    def kernel(*refs):
        xq_ref = refs[0]
        w_refs = refs[1:-2]
        s_ref = refs[-2]
        out_ref = refs[-1]
        q = xq_ref[0]  # (HW_in, Cin) int8
        wi = 0
        h, w_ = H, W
        for i, m in enumerate(meta):
            P = m["P"]
            w1 = w_refs[wi][:]; w2 = w_refs[wi + 1][:]; w3 = w_refs[wi + 2][:]
            wi += 3
            s = stride if i == 0 else 1
            d1 = _dot_i8(q, w1).astype(jnp.float32)
            q1 = _requant(jnp.maximum(d1 * s_ref[i, 0, :P] + s_ref[i, 1, :P], 0.0))
            cat = _conv3x3_cat(q1, h, w_)
            if s == 2:
                cat = _subsample2(cat, h, w_)
            d2 = _dot_i8(cat, w2).astype(jnp.float32)
            q2 = _requant(jnp.maximum(d2 * s_ref[i, 2, :P] + s_ref[i, 3, :P], 0.0))
            y3 = _dot_i8(q2, w3).astype(jnp.float32) * s_ref[i, 4] + s_ref[i, 5]
            if m["has_proj"]:
                wp = w_refs[wi][:]
                wi += 1
                qs = _subsample2(q, h, w_) if s == 2 else q
                res = _dot_i8(qs, wp).astype(jnp.float32) * s_ref[i, 6] + s_ref[i, 7]
            else:
                res = q.astype(jnp.float32) * s_ref[i, 6]
            q = _requant(jnp.maximum(y3 + res, 0.0))
            if s == 2:
                h, w_ = h // 2, w_ // 2
        out_ref[0] = q

    return kernel


def bottleneck_chain_int8(
    xq: jax.Array,
    blocks: Sequence[dict],
    height: int,
    width: int,
    stride: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Run a chain of int8 Bottleneck blocks fully inside VMEM.

    xq     : (B, HW, Cin) int8
    blocks : per block {'w1': (Cin_i, P) i8, 'w2': (9P, P) i8,
             'w3': (P, 4P) i8, 'wp': (Cin_i, 4P) i8 (first block only),
             'scales': (8, 4P) f32}
    stride : spatial stride of the FIRST block (1 or 2)
    returns: (B, HW/stride^2, 4P) int8
    """
    B, HW, Cin = xq.shape
    assert HW == height * width
    meta = []
    operands, specs = [], []
    for i, b in enumerate(blocks):
        P = b["w2"].shape[-1]
        meta.append({"P": P, "cin": b["w1"].shape[0], "has_proj": "wp" in b})
        for key in ("w1", "w2", "w3") + (("wp",) if "wp" in b else ()):
            operands.append(b[key])
            specs.append(
                pl.BlockSpec(
                    b[key].shape,
                    lambda i, n=b[key].ndim: (0,) * n,
                    memory_space=pltpu.VMEM,
                )
            )
    scales = jnp.stack([b["scales"] for b in blocks], 0)
    specs.append(
        pl.BlockSpec(scales.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    C_out = blocks[-1]["w3"].shape[-1]
    HW_out = HW // (stride * stride)

    fn = pl.pallas_call(
        _make_bottleneck_kernel(meta, height, width, stride),
        out_shape=jax.ShapeDtypeStruct((B, HW_out, C_out), jnp.int8),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + specs,
        out_specs=pl.BlockSpec((1, HW_out, C_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret) or FORCE_INTERPRET,
    )
    return fn(xq, *operands, scales)


def fold_bottleneck_chain(specs: Sequence[dict], s_in: jax.Array):
    """Fold Bottleneck serving specs (from Bottleneck.__call__ on a
    SpecRequest) into bottleneck_chain_int8 operands.

    Returns (blocks, s_out_last)."""
    blocks = []
    s = s_in
    for sp in specs:
        P = sp["conv2"].wq.shape[-1]
        C4 = sp["conv3"].wq.shape[-1]
        A1, B1 = sp["bn1"]; A2, B2 = sp["bn2"]; A3, B3 = sp["bn3"]
        s1, s2, s_out = sp["s1"], sp["s2"], sp["s_out"]

        def pad(v):
            return jnp.pad(v, (0, C4 - v.shape[0]))

        a1 = pad(s * sp["conv1"].sw * A1 / s1)
        b1 = pad(B1 / s1)
        a2 = pad(s1 * sp["conv2"].sw * A2 / s2)
        b2 = pad(B2 / s2)
        a3 = s2 * sp["conv3"].sw * A3 / s_out
        b3 = B3 / s_out
        if "down_conv" in sp:
            Ap, Bp = sp["down_bn"]
            ap = s * sp["down_conv"].sw * Ap / s_out
            bp = Bp / s_out
        else:
            ap = jnp.broadcast_to(s / s_out, (C4,))
            bp = jnp.zeros((C4,))
        blk = {
            "w1": sp["conv1"].wq.reshape(-1, P),
            "w2": sp["conv2"].wq.reshape(9 * P, P),
            "w3": sp["conv3"].wq.reshape(P, C4),
            "scales": jnp.stack(
                [a1, b1, a2, b2, a3, b3, ap, bp], 0
            ).astype(jnp.float32),
        }
        if "down_conv" in sp:
            blk["wp"] = sp["down_conv"].wq.reshape(-1, C4)
        blocks.append(blk)
        s = s_out
    return blocks, s


def chunk_bottleneck_specs(specs, height, width, budget_bytes=6 * 1024 * 1024):
    """Split a stage's block list into groups whose weights fit the VMEM
    budget (Mosaic may double-buffer inputs). Returns a list of index
    groups; the first group owns the stage's stride."""
    groups, cur, cur_bytes = [], [], 0
    for i, sp in enumerate(specs):
        nbytes = sum(
            int(np.prod(sp[k].wq.shape))
            for k in ("conv1", "conv2", "conv3", "down_conv")
            if k in sp
        )
        if cur and cur_bytes + nbytes > budget_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += nbytes
    if cur:
        groups.append(cur)
    return groups


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
