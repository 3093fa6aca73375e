"""Space-to-depth packed HRNet for inference — exact, pure-XLA speedup.

Measured on v5e (batch 256, 64x64 maps, bf16): 3x3 convs run at ~12
TFLOP/s with 32 channels but ~90 TFLOP/s with 128 — the MXU's 128-lane
output dimension is idle at HRNet's high-res widths. This module runs the
narrow branches in space-to-depth packed layout:

    x (B, H, W, C)  --pack-->  X (B, H/2, W/2, 4C)

A stride-1 3x3 SAME conv in plain space is EXACTLY a stride-1 3x3 SAME
conv in packed space with a rearranged kernel: writing output offset
o in {0,1}^2, input offset s = 2m + r (m in {-1,0,1}^2, r in {0,1}^2),

    W_packed[m, (r, ci), (o, co)] = W[2m + r - o, ci, co]   (0 otherwise)

so a (3,3,C,C) kernel becomes a mostly-sparse-but-densely-stored
(3,3,4C,4C) kernel: 4x the FLOPs at ~7x the efficiency = ~1.8x faster
for C=32. BN/ReLU/residual are per-channel/elementwise and commute with
packing (BN vectors tile 4x). Exact only with running-average BN, so this
is an INFERENCE path: train with models.hrnet.HRNet, convert variables
with `pack_hrnet_variables`, serve with `HRNetPacked`.

Packing rule: branches with C <= PACK_MAX_CH (48) are packed — on w32
that is the 64x64x32 branch (~98 ms of the 133 ms rootnet time at batch
256); wider branches already utilize the MXU and packing would lose.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .hrnet import HEAD_CHANNELS, HRNET_STAGES, ClsHead, FuseUnit, Transition, _bn, _conv
from .resnet import Bottleneck

PACK_MAX_CH = 48


def space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h/2, w/2, di, dj, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def pack_conv_kernel(W: np.ndarray) -> np.ndarray:
    """(3, 3, C, C') plain kernel -> (3, 3, 4C, 4C') packed kernel."""
    kh, kw, C, Co = W.shape
    assert kh == 3 and kw == 3
    Wp = np.zeros((3, 3, 4 * C, 4 * Co), W.dtype)
    for mi in range(3):          # packed kernel tap (m = tap - 1)
        for mj in range(3):
            for ri in range(2):  # input sub-position
                for rj in range(2):
                    for oi in range(2):  # output sub-position
                        for oj in range(2):
                            di = 2 * (mi - 1) + ri - oi  # plain offset
                            dj = 2 * (mj - 1) + rj - oj
                            if -1 <= di <= 1 and -1 <= dj <= 1:
                                pin = (ri * 2 + rj) * C
                                pout = (oi * 2 + oj) * Co
                                Wp[mi, mj, pin : pin + C, pout : pout + Co] = W[
                                    di + 1, dj + 1
                                ]
    return Wp


def tile4(v: np.ndarray) -> np.ndarray:
    """Per-channel BN vector (C,) -> packed (4C,) (channel = block*C + ci)."""
    return np.tile(np.asarray(v), 4)


class PackedBasicBlock(nn.Module):
    """BasicBlock operating on packed layout; inference only (running BN)."""

    planes: int  # PLAIN channel count; packed features are 4x
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train, "packed blocks are an inference-only path"
        P = 4 * self.planes
        residual = x
        y = nn.Conv(P, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(P, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        return nn.relu(y + residual)


class HRModulePacked(nn.Module):
    """HRModule with narrow branches run in packed layout."""

    channels: Sequence[int]
    blocks: int
    multi_scale_output: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from .resnet import BasicBlock

        ys = []
        for bi, x in enumerate(xs):
            ch = self.channels[bi]
            if ch <= PACK_MAX_CH:
                x = space_to_depth(x)
                for k in range(self.blocks):
                    x = PackedBasicBlock(
                        ch, self.dtype, name=f"branch{bi}_block{k}"
                    )(x, train)
                x = depth_to_space(x)
            else:
                for k in range(self.blocks):
                    x = BasicBlock(
                        ch, 1, False, self.dtype, name=f"branch{bi}_block{k}"
                    )(x, train)
            ys.append(x)
        n_out = len(self.channels) if self.multi_scale_output else 1
        return FuseUnit(
            self.channels, self.channels, n_out, self.dtype, name="fuse"
        )(ys, train)


class HRNetPacked(nn.Module):
    """Inference twin of models.hrnet.HRNet with packed narrow branches.

    Same parameter tree names; packed blocks have transformed shapes —
    convert trained variables with `pack_hrnet_variables`.
    """

    width: int = 32
    num_joints: int = 7
    depth_dim: int = 64
    generate_hm: bool = True
    generate_feat: bool = True
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32
    qmode: str | None = None  # accepted for HRNet interface parity; int8
    # and packing are alternative serving modes, combine is unsupported

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train
        cfg = HRNET_STAGES[self.width]
        x = _conv(64, 3, 2, "stem_conv1", self.dtype)(x)
        x = _bn(train, self.dtype, "stem_bn1")(x)
        x = nn.relu(x)
        x = _conv(64, 3, 2, "stem_conv2", self.dtype)(x)
        x = _bn(train, self.dtype, "stem_bn2")(x)
        x = nn.relu(x)
        for k in range(4):
            x = Bottleneck(64, 1, k == 0, self.dtype, name=f"layer1_{k}")(x, train)

        xs = [x]
        prev = (256,)
        for sname in ("stage2", "stage3", "stage4"):
            scfg = cfg[sname]
            xs = Transition(
                prev, scfg["channels"], self.dtype, name=f"transition_{sname}"
            )(xs, train)
            last_stage = sname == "stage4"
            for m in range(scfg["modules"]):
                mso = True
                if last_stage and not self.generate_feat and m == scfg["modules"] - 1:
                    mso = False
                xs = HRModulePacked(
                    scfg["channels"], scfg["blocks"], mso, self.dtype,
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
            )(xs[0])
        feat = None
        if self.generate_feat:
            feat = ClsHead(self.dtype, name="cls_head")(xs, train)
        if self.generate_hm and self.generate_feat:
            return out_hm, feat
        if self.generate_hm:
            return out_hm
        return feat


def pack_hrnet_variables(variables: dict, width: int = 32) -> dict:
    """Transform plain-HRNet variables into HRNetPacked variables.

    Touches only branch blocks with channels <= PACK_MAX_CH: conv kernels
    are repacked (pack_conv_kernel) and BN vectors tiled 4x; everything
    else passes through unchanged.
    """
    import flax

    cfg = HRNET_STAGES[width]
    packed_prefixes = []
    for sname in ("stage2", "stage3", "stage4"):
        scfg = cfg[sname]
        for m in range(scfg["modules"]):
            for bi, ch in enumerate(scfg["channels"]):
                if ch <= PACK_MAX_CH:
                    for k in range(scfg["blocks"]):
                        packed_prefixes.append(
                            (f"{sname}_m{m}", f"branch{bi}_block{k}")
                        )
    packed_set = set(packed_prefixes)

    out = {}
    for coll, tree in variables.items():
        flat = flax.traverse_util.flatten_dict(tree)
        new_flat = {}
        for path, leaf in flat.items():
            a = np.asarray(leaf)
            # match .../<module>/<block>/<sub>/<leafname> at any nesting
            hit = None
            for i in range(len(path) - 1):
                if (path[i], path[i + 1]) in packed_set:
                    hit = i
                    break
            if hit is not None:
                sub = path[-2]
                leafname = path[-1]
                if sub.startswith("conv") and leafname == "kernel":
                    a = pack_conv_kernel(a)
                elif sub.startswith("bn") and leafname in (
                    "scale", "bias", "mean", "var"
                ):
                    a = tile4(a)
            new_flat[path] = jnp.asarray(a)
        out[coll] = flax.traverse_util.unflatten_dict(new_flat)
    return out
