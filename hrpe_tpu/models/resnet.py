"""ResNet trunks in flax.linen, NHWC, bf16-capable.

Re-design of the reference's torch ResNet (lib/models/backbones/Resnet.py)
for TPU: NHWC layout (XLA:TPU's native conv layout), parameter dtype f32
with a configurable compute dtype (bfloat16 keeps the MXU fed), BatchNorm
running statistics carried in a `batch_stats` collection (PyTorch
momentum=0.1 == flax momentum=0.9).

The trunk returns the final stride-32 feature map (B, H/32, W/32, C); heads
live in full_net.py / depth_net.py, exactly like the reference
(`ResNet.forward` returns layer4 output, Resnet.py:57-68).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.quant import (ConvSpec, QuantConv, Requant, SpecRequest, deq,
                         to_scalar_scale)


def _bn_affine(bn_module, C):
    """Extract the serving-time per-channel affine (A, B) of a BatchNorm
    submodule without touching its internals: bn(x) = x*A + B at
    use_running_average=True, so B = bn(0) and A = bn(1) - B. Two calls on
    (1,1,1,C) dummies — the module's parameter scope is created exactly as
    in the normal forward, keeping checkpoints identical."""
    zeros = jnp.zeros((1, 1, 1, C), jnp.float32)
    ones = jnp.ones((1, 1, 1, C), jnp.float32)
    B = bn_module(zeros).reshape(C).astype(jnp.float32)
    A = bn_module(ones).reshape(C).astype(jnp.float32) - B
    return A, B

RESNET_SPECS = {
    # name: (bottleneck?, blocks per stage, stage widths)
    "resnet18": (False, (2, 2, 2, 2), (64, 128, 256, 512)),
    "resnet34": (False, (3, 4, 6, 3), (64, 128, 256, 512)),
    "resnet50": (True, (3, 4, 6, 3), (64, 128, 256, 512)),
    "resnet101": (True, (3, 4, 23, 3), (64, 128, 256, 512)),
    "resnet152": (True, (3, 8, 36, 3), (64, 128, 256, 512)),
}


def feature_channels(name: str) -> int:
    bottleneck, _, widths = RESNET_SPECS[canonical(name)]
    return widths[-1] * (4 if bottleneck else 1)


def canonical(name: str) -> str:
    return "resnet50" if name == "resnet" else name


class BatchNorm(nn.Module):
    """BN wrapper pinned to the reference's torch semantics."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=(jnp.float32 if train else self.dtype),
            name="bn",
        )(x)


def conv(features, kernel, stride=1, name=None, dtype=jnp.float32, qmode=None):
    return QuantConv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        qmode=qmode,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        if isinstance(x, SpecRequest):
            # fused int8 serving: export this block's folded spec instead
            # of computing (ops/pallas/conv_chain.py consumes it). Only the
            # no-downsample stride-1 form (HRNet branch blocks) fuses.
            assert not self.downsample and self.stride == 1, "unfused form"
            C = self.planes
            spec = {
                "conv1": conv(C, 3, 1, "conv1", self.dtype, self.qmode)(x),
                "bn1": _bn_affine(
                    nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn1"),
                    C,
                ),
                "s_mid": Requant(self.qmode, name="rq1")(x),
                "conv2": conv(C, 3, 1, "conv2", self.dtype, self.qmode)(
                    SpecRequest(C)
                ),
                "bn2": _bn_affine(
                    nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn2"),
                    C,
                ),
                "s_out": Requant(self.qmode, name="rq_out")(x),
            }
            return spec
        residual = x
        y = conv(self.planes, 3, self.stride, "conv1", self.dtype, self.qmode)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=(jnp.float32 if train else self.dtype), name="bn1")(y)
        y = nn.relu(y)
        # int8 pipelining: the BN+ReLU epilogue requantizes to int8 so the
        # next conv reads int8 straight from HBM (half the bf16 traffic,
        # no separate quantize pass); identity in bf16/training.
        y = Requant(self.qmode, name="rq1")(y)
        y = conv(self.planes, 3, 1, "conv2", self.dtype, self.qmode)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=(jnp.float32 if train else self.dtype), name="bn2")(y)
        if self.downsample:
            residual = QuantConv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, qmode=self.qmode, name="down_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=(jnp.float32 if train else self.dtype), name="down_bn",
            )(residual)
        out = nn.relu(y + deq(residual, y.dtype))
        return Requant(self.qmode, name="rq_out")(out)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    dilation: int = 1
    qmode: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        if isinstance(x, SpecRequest):
            # fused int8 serving: export this block's folded spec
            # (ops/pallas/conv_chain.py bottleneck_chain_int8 consumes it)
            assert self.dilation == 1, "dilated bottlenecks are not fused"
            P, C4, cin = self.planes, self.planes * 4, x.cin
            spec = {
                "conv1": QuantConv(P, (1, 1), use_bias=False, dtype=self.dtype,
                                   qmode=self.qmode, name="conv1")(x),
                "bn1": _bn_affine(
                    nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn1"), P),
                "s1": Requant(self.qmode, name="rq1")(x),
                "conv2": conv(P, 3, self.stride, "conv2", self.dtype, self.qmode)(
                    SpecRequest(P)),
                "bn2": _bn_affine(
                    nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn2"), P),
                "s2": Requant(self.qmode, name="rq2")(x),
                "conv3": QuantConv(C4, (1, 1), use_bias=False, dtype=self.dtype,
                                   qmode=self.qmode, name="conv3")(SpecRequest(P)),
                "bn3": _bn_affine(
                    nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn3"), C4),
                "s_out": Requant(self.qmode, name="rq_out")(x),
            }
            if self.downsample:
                spec["down_conv"] = QuantConv(
                    C4, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, qmode=self.qmode,
                    name="down_conv",
                )(SpecRequest(cin))
                spec["down_bn"] = _bn_affine(
                    nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name="down_bn"), C4)
            return spec
        residual = x
        y = QuantConv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, qmode=self.qmode, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=(jnp.float32 if train else self.dtype), name="bn1")(y)
        y = nn.relu(y)
        y = Requant(self.qmode, name="rq1")(y)
        if self.dilation > 1:
            y = QuantConv(
                self.planes, (3, 3), strides=(self.stride, self.stride),
                padding=[(self.dilation, self.dilation)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False, dtype=self.dtype, qmode=self.qmode, name="conv2",
            )(y)
        else:
            y = conv(self.planes, 3, self.stride, "conv2", self.dtype, self.qmode)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=(jnp.float32 if train else self.dtype), name="bn2")(y)
        y = nn.relu(y)
        y = Requant(self.qmode, name="rq2")(y)
        y = QuantConv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, qmode=self.qmode, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=(jnp.float32 if train else self.dtype), name="bn3")(y)
        if self.downsample:
            residual = QuantConv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, qmode=self.qmode, name="down_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=(jnp.float32 if train else self.dtype), name="down_bn",
            )(residual)
        out = nn.relu(y + deq(residual, y.dtype))
        return Requant(self.qmode, name="rq_out")(out)


class ResNet(nn.Module):
    """Stride-32 trunk; `__call__` returns the final NHWC feature map."""

    name_spec: str = "resnet50"
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bottleneck, blocks, widths = RESNET_SPECS[canonical(self.name_spec)]
        block_cls = Bottleneck if bottleneck else BasicBlock
        expansion = 4 if bottleneck else 1

        x = QuantConv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)  # stem stays unquantized: 3-ch input, negligible FLOPs
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=(jnp.float32 if train else self.dtype), name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = Requant(self.qmode, name="stem_rq")(x)

        from ..ops.quant import QTensor

        if (
            self.qmode == "int8f"
            and not train
            and bottleneck
            and isinstance(x, QTensor)
        ):
            # fused serving: each stage's bottlenecks run as VMEM-resident
            # Pallas chains (ops/pallas/conv_chain.py), chunked to the
            # kernel's weight budget; activations cross HBM once per chunk
            from ..ops.pallas.conv_chain import (
                bottleneck_chain_int8,
                chunk_bottleneck_specs,
                fold_bottleneck_chain,
            )

            x = to_scalar_scale(x)  # chain kernels fold scalar s_in
            B, H, W, _ = x.data.shape
            q, s = x.data.reshape(B, H * W, x.data.shape[-1]), x.scale
            in_ch = 64
            for stage, (n_blocks, width) in enumerate(zip(blocks, widths)):
                stride = 1 if stage == 0 else 2
                specs = []
                for b in range(n_blocks):
                    down = b == 0 and (stride != 1 or in_ch != width * 4)
                    cin = in_ch
                    specs.append(
                        block_cls(
                            width, stride if b == 0 else 1, down, self.dtype,
                            qmode=self.qmode, name=f"layer{stage + 1}_{b}",
                        )(SpecRequest(cin), False)
                    )
                    in_ch = width * 4
                for g in chunk_bottleneck_specs(specs, H, W):
                    blk, s = fold_bottleneck_chain([specs[i] for i in g], s)
                    st = stride if 0 in g else 1
                    q = bottleneck_chain_int8(q, blk, H, W, st)
                    if st == 2:
                        H, W = H // 2, W // 2
            return deq(QTensor(q.reshape(B, H, W, in_ch), s), self.dtype)

        in_ch = 64
        for stage, (n_blocks, width) in enumerate(zip(blocks, widths)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                down = b == 0 and (stride != 1 or in_ch != width * expansion)
                x = block_cls(
                    width,
                    stride if b == 0 else 1,
                    down,
                    self.dtype,
                    qmode=self.qmode,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                in_ch = width * expansion
        return deq(x, self.dtype)
