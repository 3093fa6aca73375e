"""int8 (w8a8) inference path for the conv trunks.

The v5e MXU runs int8 at ~2x bf16 throughput (measured on-chip: C=32
3x3 convs 87->133 TF/s, C=128 147->407; scripts/conv_microbench.py), and
int8 activations halve HBM traffic. This module provides `QuantConv`, a
drop-in for the subset of nn.Conv the backbones use (NHWC, HWIO, no
groups), with three modes selected by the `qmode` attribute:

  None     - plain conv in `dtype` (bit-compatible with nn.Conv: same
             param names/shapes/init, same lax.conv_general_dilated call)
  'calib'  - plain forward that also records the running max |activation|
             into a mutable 'quant' collection (like BN running stats)
  'int8'   - static-scale quantized forward: per-tensor activation scale
             (from calibration), per-output-channel symmetric weight
             scales, int8 x int8 -> int32 MXU conv, dequant+BN+ReLU+next
             -quantize all fuse into XLA epilogues (no data-dependent
             reductions at inference time).

Activations are PIPELINED in int8 between convs: `Requant` placed at the
end of each elementwise region (post BN+ReLU / post residual-add) emits a
`QTensor` (int8 data + its scale). A QuantConv that receives a QTensor
consumes the int8 data directly — no separate quantize pass, and the
int8 tensor is the ONLY thing that crosses HBM between conv regions
(half the bf16 traffic). The scale travels WITH the tensor, so no
cross-layer plumbing is needed: consumers use the producer's calibrated
scale. XLA fuses quantize/dequantize/BN/ReLU into the conv epilogue.

Weights stay f32 in the params tree (torch checkpoint import and training
are untouched); they are rounded to int8 inside the forward, which is
negligible next to the conv itself.

Reference parity note: the reference has no quantized path (pure fp32
torch, lib/models/backbones/*.py); this is a TPU-native serving feature.
Fidelity int8-vs-bf16 is asserted in tests/test_quant.py and gated
end-to-end in bench.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

QMODES = (None, "calib", "int8", "int8f")
# 'int8f' == 'int8' plus fused residual-block chains: conv trunks execute
# whole block stacks in one Pallas kernel (ops/pallas/conv_chain.py) so
# activations never round-trip HBM between convs. QuantConv/Requant treat
# it exactly like 'int8'; block/module classes key the fused path off it.
INT8_MODES = ("int8", "int8f")


class QTensor(NamedTuple):
    """An int8 activation tensor together with its (static) scale."""

    data: jax.Array  # int8, NHWC
    scale: jax.Array  # () or (C,) f32; dequantized value = data * scale


class SpecRequest(NamedTuple):
    """Sentinel input: ask a quantized module for its folded serving spec
    instead of a forward pass (used by the fused int8 serving path to
    extract weights/scales through the normal flax parameter scopes, so
    parameter names/shapes — and therefore checkpoints — are untouched).
    `cin` supplies the input channel count that shape inference would
    otherwise read off the activation."""

    cin: int


class ConvSpec(NamedTuple):
    """QuantConv serving spec: int8 weights + per-out-channel scales."""

    wq: jax.Array  # (kh, kw, cin, cout) int8
    sw: jax.Array  # (cout,) f32
    bias: jax.Array | None


def deq(x, dtype=jnp.bfloat16):
    """Dequantize a QTensor to `dtype`; pass plain arrays through."""
    if isinstance(x, QTensor):
        return (x.data.astype(jnp.float32) * x.scale).astype(dtype)
    return x


def _shape_of(x):
    return x.data.shape if isinstance(x, QTensor) else x.shape


def to_scalar_scale(x: QTensor) -> QTensor:
    """Collapse a per-channel QTensor to one per-tensor scale.

    The fused Pallas chain kernels (ops/pallas/conv_chain.py) fold SCALAR
    input scales into their per-block scale rows; per-channel activation
    scales (round-5 calibration) are requantized down to the channel max
    before entering a chain. int8f numerics therefore match the pre-r5
    per-tensor behavior (it is quality-gated separately in bench.py)."""
    if x.scale.ndim == 0:
        return x
    s0 = jnp.max(x.scale)
    q = jnp.clip(
        jnp.round(x.data.astype(jnp.float32) * (x.scale / s0)), -127, 127
    ).astype(jnp.int8)
    return QTensor(q, s0)


class Requant(nn.Module):
    """End-of-region requantization point.

    qmode None  -> identity (declares nothing; variable tree unchanged).
    qmode calib -> records running max |x| into 'quant'/out_max, passes x.
    qmode int8  -> returns QTensor(round(x/s), s) with s from calibration.
    Placed after each BN+ReLU / residual-add region whose output feeds
    further quantized convs.
    """

    qmode: str | None = None

    @nn.compact
    def __call__(self, x):
        assert self.qmode in QMODES, self.qmode
        if self.qmode is None:
            return x
        # PER-CHANNEL activation scales (round 5): trained-weight trunks
        # have per-channel activation ranges spanning >10x; one tensor-max
        # scale wastes most of the int8 grid on the quiet channels (the r4
        # fidelity failure: uvd delta 9 heatmap cells). A (C,) scale is
        # free at serving time — consumers fold it into the next conv's
        # weights before weight quantization (see QuantConv).
        C = x.cin if isinstance(x, SpecRequest) else _shape_of(x)[-1]
        out_max = self.variable(
            "quant", "out_max", lambda: jnp.zeros((C,), jnp.float32)
        )
        if isinstance(x, SpecRequest):
            # fused chain path folds ONE scalar input scale per chain
            return jnp.maximum(jnp.max(out_max.value), 1e-6) / 127.0
        if self.qmode == "calib":
            if not self.is_initializing():
                red = tuple(range(x.ndim - 1))
                out_max.value = jnp.maximum(
                    out_max.value,
                    jnp.max(jnp.abs(x), axis=red).astype(jnp.float32),
                )
            return x
        s = jnp.maximum(out_max.value, 1e-6) / 127.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / s)), -127, 127
        ).astype(jnp.int8)
        return QTensor(q, s)


class QuantConv(nn.Module):
    """nn.Conv subset (NHWC/HWIO, groups=1) with an optional int8 path."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Sequence[int] = (1, 1)
    use_bias: bool = False
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, x):
        assert self.qmode in QMODES, self.qmode
        kh, kw = self.kernel_size
        cin = x.cin if isinstance(x, SpecRequest) else _shape_of(x)[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dn = ("NHWC", "HWIO", "NHWC")

        if isinstance(x, SpecRequest):
            # fused serving path: return quantized weights, don't compute
            wmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
            sw = jnp.maximum(wmax, 1e-12) / 127.0
            wq = jnp.round(kernel * (1.0 / sw)).astype(jnp.int8)
            return ConvSpec(wq, sw, bias)

        if self.qmode in INT8_MODES:
            if isinstance(x, QTensor):
                # pipelined input: already int8, scale travels with it
                xq, sx = x.data, x.scale
            else:
                # act_max was recorded by a calibration pass; it is a
                # variable, not a param, so checkpoints are unaffected.
                # Per-channel (cin,) since round 5 — see Requant.
                act_max = self.variable(
                    "quant", "act_max", lambda: jnp.zeros((cin,), jnp.float32)
                )
                sx = jnp.maximum(act_max.value, 1e-6) / 127.0
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127, 127
                ).astype(jnp.int8)
            # fold the (per-channel) input scale into the kernel BEFORE
            # weight quantization: conv(x/sx, k*sx) == conv(x, k), so the
            # int8 conv and its epilogue are unchanged — the per-cin scale
            # costs nothing at serving time (it reshapes calibration
            # precision, standard w8a8 recipe)
            k_eff = kernel * (
                jnp.reshape(sx, (1, 1, -1, 1)) if sx.ndim else sx
            )
            wmax = jnp.max(jnp.abs(k_eff), axis=(0, 1, 2))
            sw = jnp.maximum(wmax, 1e-12) / 127.0
            wq = jnp.round(k_eff * (1.0 / sw)).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, tuple(self.strides), self.padding,
                rhs_dilation=tuple(self.kernel_dilation),
                dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * sw
            if bias is not None:
                y = y + bias
            # NOTE on glue dtype (measured on v5e, full trunks at batch
            # 256): conv-chain microbenches prefer f32 glue (no bf16 cast
            # between conv and the next quantize: 0.19 -> 0.145 ms/conv),
            # but in the FULL models f32 glue doubles the traffic of every
            # materialized inter-branch tensor (fuse units, residuals,
            # upsampling) and nets out SLOWER (hrnet 55.6 -> 71.8
            # ms/batch). bf16 glue wins end-to-end; Requant pipelining
            # removes most of the materialized bf16 anyway.
            return y.astype(self.dtype)

        if self.qmode == "calib":
            act_max = self.variable(
                "quant", "act_max", lambda: jnp.zeros((cin,), jnp.float32)
            )
            if not self.is_initializing():
                red = tuple(range(x.ndim - 1))
                act_max.value = jnp.maximum(
                    act_max.value,
                    jnp.max(jnp.abs(x), axis=red).astype(jnp.float32),
                )

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            tuple(self.strides), self.padding,
            rhs_dilation=tuple(self.kernel_dilation),
            dimension_numbers=dn,
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
