"""HRNet-W32/W48 pose backbone in flax.linen, NHWC, bf16-capable.

Functional re-design of the reference's torch HRNet
(lib/models/backbones/HRnet.py, itself MSRA pose_hrnet): 4-stage
multi-resolution network with sum-fused exchange units, a heatmap head
(1x1 conv -> num_joints*depth_dim channels from the highest-resolution
branch, HRnet.py:330-337) and a classification head (incre/downsample
bottleneck pyramid -> 2048-d pooled feature, HRnet.py:341-388). The
`generate_hm` / `generate_feat` flags select outputs exactly like the
reference (HRnet.py:499-570).

TPU notes: everything is NHWC; nearest-neighbor 2^k upsampling in the fuse
units is a reshape-broadcast (cheap, layout-friendly); all convs run in the
configurable compute dtype so the MXU sees bf16 while params/batch-stats
stay f32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.quant import (QTensor, QuantConv, Requant, SpecRequest, deq,
                         to_scalar_scale)
from .resnet import BasicBlock, Bottleneck

# stage configs (ref: backbones/configs/hrnet_w32.yaml:55-93 / hrnet_w48)
HRNET_STAGES = {
    32: dict(
        stage2=dict(modules=1, branches=2, blocks=4, channels=(32, 64)),
        stage3=dict(modules=4, branches=3, blocks=4, channels=(32, 64, 128)),
        stage4=dict(modules=3, branches=4, blocks=4, channels=(32, 64, 128, 256)),
    ),
    48: dict(
        stage2=dict(modules=1, branches=2, blocks=4, channels=(48, 96)),
        stage3=dict(modules=4, branches=3, blocks=4, channels=(48, 96, 192)),
        stage4=dict(modules=3, branches=4, blocks=4, channels=(48, 96, 192, 384)),
    ),
}

HEAD_CHANNELS = (32, 64, 128, 256)  # ref HRnet.py:343 (x4 bottleneck expansion)


def _bn(train, dtype, name, qmode=None):
    # BN runs in f32 during TRAINING: although flax computes statistics in
    # f32 regardless, a bf16 BN affine in the train step empirically NaN'd
    # the first 256^2 bf16 step on the TPU runtime (round-1 verification).
    # Inference BN is a per-channel affine — safe in the compute dtype.
    # (qmode accepted for call-site symmetry; an f32-glue int8 variant was
    # measured SLOWER end-to-end — see ops/quant.py NOTE.)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=(jnp.float32 if train else dtype), name=name,
    )


def _conv(ch, k, s, name, dtype, bias=False, qmode=None):
    return QuantConv(
        ch, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
        use_bias=bias, dtype=dtype, qmode=qmode, name=name,
    )


def upsample_nearest(x, factor: int):
    """Nearest 2^k upsample as reshape+broadcast (no gather, layout-friendly)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class FuseUnit(nn.Module):
    """Exchange unit: every output branch sums transforms of all inputs.

    Ref parity: HRnet.py:187-265 (upsample path = 1x1 conv + BN + nearest
    up; downsample path = chained stride-2 3x3 convs, last one without ReLU).
    """

    out_channels: Sequence[int]
    in_channels: Sequence[int]
    n_out: int
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool):
        outs = []
        for i in range(self.n_out):
            acc = None
            for j, x in enumerate(xs):
                if j == i:
                    y = deq(x, self.dtype)
                elif j > i:
                    y = QuantConv(
                        self.out_channels[i], (1, 1), use_bias=False,
                        dtype=self.dtype, qmode=self.qmode, name=f"up_{i}_{j}_conv",
                    )(x)
                    y = _bn(train, self.dtype, f"up_{i}_{j}_bn", self.qmode)(y)
                    y = upsample_nearest(y, 2 ** (j - i))
                else:  # j < i: downsample chain
                    y = x
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.out_channels[i] if last else self.in_channels[j]
                        y = _conv(ch, 3, 2, f"down_{i}_{j}_{k}_conv", self.dtype,
                                  qmode=self.qmode)(y)
                        y = _bn(train, self.dtype, f"down_{i}_{j}_{k}_bn", self.qmode)(y)
                        if not last:
                            y = nn.relu(y)
                            y = Requant(self.qmode, name=f"down_{i}_{j}_{k}_rq")(y)
                acc = y if acc is None else acc + y
            outs.append(Requant(self.qmode, name=f"out_{i}_rq")(nn.relu(acc)))
        return outs


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch residual blocks + fuse."""

    channels: Sequence[int]
    blocks: int
    multi_scale_output: bool = True
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool):
        ys = []
        for bi, x in enumerate(xs):
            if (
                self.qmode == "int8f"
                and not train
                and isinstance(x, QTensor)
            ):
                # fused serving: run this branch's whole block stack in one
                # Pallas kernel — activations never leave VMEM between the
                # 2*blocks convs (ops/pallas/conv_chain.py)
                from ..ops.pallas.conv_chain import (
                    basicblock_chain_int8,
                    fold_basicblock_chain,
                )

                C = self.channels[bi]
                specs = [
                    BasicBlock(
                        C, 1, False, self.dtype, qmode=self.qmode,
                        name=f"branch{bi}_block{k}",
                    )(SpecRequest(C), False)
                    for k in range(self.blocks)
                ]
                xs = to_scalar_scale(x)  # chain kernels fold scalar s_in
                w, s, s_out = fold_basicblock_chain(specs, xs.scale)
                B, H, W, _ = xs.data.shape
                q = basicblock_chain_int8(
                    xs.data.reshape(B, H * W, C), w, s, H, W
                )
                ys.append(QTensor(q.reshape(B, H, W, C), s_out))
                continue
            for k in range(self.blocks):
                x = BasicBlock(
                    self.channels[bi], 1, False, self.dtype, qmode=self.qmode,
                    name=f"branch{bi}_block{k}",
                )(x, train)
            ys.append(x)
        n_out = len(self.channels) if self.multi_scale_output else 1
        ys = FuseUnit(
            self.channels, self.channels, n_out, self.dtype, self.qmode, name="fuse"
        )(ys, train)
        return ys


class Transition(nn.Module):
    """Stage transition: adapt channel counts, spawn one lower branch."""

    prev_channels: Sequence[int]
    next_channels: Sequence[int]
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, xs, train: bool):
        outs = []
        for i, ch in enumerate(self.next_channels):
            if i < len(self.prev_channels):
                if ch != self.prev_channels[i]:
                    y = _conv(ch, 3, 1, f"t{i}_conv", self.dtype, qmode=self.qmode)(xs[i])
                    y = _bn(train, self.dtype, f"t{i}_bn", self.qmode)(y)
                    outs.append(Requant(self.qmode, name=f"t{i}_rq")(nn.relu(y)))
                else:
                    outs.append(xs[i])
            else:
                # new branch from the previous last: chained stride-2 convs
                y = xs[-1]
                for j in range(i + 1 - len(self.prev_channels)):
                    out_ch = ch if j == i - len(self.prev_channels) else self.prev_channels[-1]
                    y = _conv(out_ch, 3, 2, f"t{i}_{j}_conv", self.dtype, qmode=self.qmode)(y)
                    y = _bn(train, self.dtype, f"t{i}_{j}_bn", self.qmode)(y)
                    y = nn.relu(y)
                    y = Requant(self.qmode, name=f"t{i}_{j}_rq")(y)
                outs.append(y)
        return outs


class ClsHead(nn.Module):
    """Classification head -> (B, 2048) pooled feature.

    Ref parity: HRnet.py:341-388 (incre bottlenecks per branch, stride-2
    downsample adds, 1x1 conv to 2048 + BN + ReLU, global average pool).
    """

    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, ys, train: bool):
        incre = []
        for i, y in enumerate(ys):
            # one bottleneck per branch: ch -> HEAD_CHANNELS[i] * 4
            incre.append(
                Bottleneck(
                    HEAD_CHANNELS[i], 1, True, self.dtype, qmode=self.qmode,
                    name=f"incre{i}",
                )(y, train)
            )
        y = incre[0]
        for i in range(len(ys) - 1):
            down = QuantConv(
                HEAD_CHANNELS[i + 1] * 4, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)], use_bias=True, dtype=self.dtype,
                qmode=self.qmode, name=f"down{i}_conv",
            )(y)
            down = _bn(train, self.dtype, f"down{i}_bn", self.qmode)(down)
            down = nn.relu(down)
            y = deq(incre[i + 1], self.dtype) + down
        y = QuantConv(2048, (1, 1), use_bias=True, dtype=self.dtype,
                      qmode=self.qmode, name="final_conv")(y)
        y = _bn(train, self.dtype, "final_bn", self.qmode)(y)
        y = nn.relu(y)
        return jnp.mean(y, axis=(1, 2))  # global average pool


class HRNet(nn.Module):
    """Pose HRNet trunk with optional heatmap and feature heads."""

    width: int = 32
    num_joints: int = 7
    depth_dim: int = 64
    generate_hm: bool = True
    generate_feat: bool = True
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32
    qmode: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = HRNET_STAGES[self.width]

        # stem (ref HRnet.py:284-291): two stride-2 3x3 convs + 4 bottlenecks
        x = _conv(64, 3, 2, "stem_conv1", self.dtype)(x)
        x = _bn(train, self.dtype, "stem_bn1", self.qmode)(x)
        x = nn.relu(x)
        x = _conv(64, 3, 2, "stem_conv2", self.dtype)(x)
        x = _bn(train, self.dtype, "stem_bn2", self.qmode)(x)
        x = nn.relu(x)
        # int8: quantize once after the stem so layer1 pipelines int8
        # (identity when qmode is None; mirrors ResNet's stem_rq)
        x = Requant(self.qmode, name="stem_rq")(x)
        if self.qmode == "int8f" and not train and isinstance(x, QTensor):
            # fused serving for the 4 stem bottlenecks (64 -> 256)
            from ..ops.pallas.conv_chain import (
                bottleneck_chain_int8,
                fold_bottleneck_chain,
            )

            specs = [
                Bottleneck(64, 1, k == 0, self.dtype, qmode=self.qmode,
                           name=f"layer1_{k}")(
                    SpecRequest(64 if k == 0 else 256), False)
                for k in range(4)
            ]
            xs = to_scalar_scale(x)  # chain kernels fold scalar s_in
            blk, s_out = fold_bottleneck_chain(specs, xs.scale)
            B, H, W, C = xs.data.shape
            q = bottleneck_chain_int8(xs.data.reshape(B, H * W, C), blk, H, W)
            x = QTensor(q.reshape(B, H, W, 256), s_out)
        else:
            for k in range(4):
                x = Bottleneck(64, 1, k == 0, self.dtype, qmode=self.qmode,
                               name=f"layer1_{k}")(x, train)

        xs = [x]
        prev = (256,)
        for sname in ("stage2", "stage3", "stage4"):
            scfg = cfg[sname]
            xs = Transition(
                prev, scfg["channels"], self.dtype, self.qmode,
                name=f"transition_{sname}",
            )(xs, train)
            last_stage = sname == "stage4"
            for m in range(scfg["modules"]):
                # when no feature head is needed the very last module can
                # collapse to a single branch (ref HRnet.py:322-323,467-497)
                mso = True
                if last_stage and not self.generate_feat and m == scfg["modules"] - 1:
                    mso = False
                xs = HRModule(
                    scfg["channels"], scfg["blocks"], mso, self.dtype, self.qmode,
                    name=f"{sname}_m{m}",
                )(xs, train)
            prev = scfg["channels"]

        out_hm = None
        if self.generate_hm:
            k = self.final_conv_kernel
            out_hm = nn.Conv(
                self.num_joints * self.depth_dim, (k, k),
                padding=[(k // 2, k // 2)] * 2, use_bias=True,
                dtype=self.dtype, name="final_hm",
            )(deq(xs[0], self.dtype))

        feat = None
        if self.generate_feat:
            feat = ClsHead(self.dtype, self.qmode, name="cls_head")(xs, train)

        if self.generate_hm and self.generate_feat:
            return out_hm, feat
        if self.generate_hm:
            return out_hm
        return feat
