"""RootNet / DepthNet: root-keypoint absolute depth from a cropped view.

Re-design of the reference's RootNet (lib/models/depth_net.py:11-163):
backbone -> pooled feature -> 1x1 conv "gamma" -> depth = gamma * k(A),
where k = sqrt(fx*fy*1000*1000/area) comes precomputed in the batch (the
reference rebuilds it per step in 5 places, SURVEY.md §7.0; here it is one
pure function in engine/losses.py). Optional branches mirror the reference:
xy soft-argmax branch (:34-42,100-111), fc bottleneck (:44-54,114-120),
offset head (:63-70,127-131).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.subpixel import SubpixelConvTranspose
from .hrnet import HRNet
from .resnet import ResNet, feature_channels


class DepthHead(nn.Module):
    """Pooled feature -> gamma -> depth (mm -> caller converts units)."""

    out: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        # 1x1 conv on a 1x1 map == a Dense layer; keep Dense (same params)
        return nn.Dense(self.out, dtype=self.dtype, name="depth_fc")(feat)


class RootNet(nn.Module):
    backbone: str = "resnet50"
    pred_xy: bool = False
    use_offset: bool = False
    add_fc: bool = False
    input_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k_value, train: bool = False):
        if self.backbone.startswith("resnet"):
            fm = ResNet(self.backbone, self.dtype, name="backbone")(x, train)
            feat = jnp.mean(fm, axis=(1, 2))  # GAP
            inplanes = feature_channels(self.backbone)
        elif self.backbone in ("hrnet", "hrnet32"):
            feat = HRNet(
                32, 7, 1, generate_hm=False, generate_feat=True,
                dtype=self.dtype, name="backbone",
            )(x, train)
            inplanes = 2048
        else:
            raise NotImplementedError(self.backbone)

        coord_xy = None
        if self.pred_xy:
            y = fm
            for i in range(3):
                y = SubpixelConvTranspose(
                    256, dtype=self.dtype, name=f"deconv{i}"
                )(y)
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    dtype=(jnp.float32 if train else self.dtype), name=f"deconv_bn{i}",
                )(y)
                y = nn.relu(y)
            y = nn.Conv(1, (1, 1), dtype=self.dtype, name="xy_conv")(y)
            B, H, W, _ = y.shape
            p = nn.softmax(y.reshape(B, H * W), axis=-1).reshape(B, H, W)
            xs = jnp.arange(W, dtype=y.dtype)
            ys = jnp.arange(H, dtype=y.dtype)
            coord_x = jnp.einsum("bhw,w->b", p, xs)
            coord_y = jnp.einsum("bhw,h->b", p, ys)
            coord_xy = jnp.stack([coord_x, coord_y], axis=-1)

        if self.add_fc:
            # bottleneck MLP with residual (ref depth_net.py:44-54,114-120)
            f1 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=(jnp.float32 if train else self.dtype), name="fc_bn1")(
                nn.Dense(inplanes // 2, dtype=self.dtype, name="fc1")(feat)))
            f2 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=(jnp.float32 if train else self.dtype), name="fc_bn2")(
                nn.Dense(inplanes // 4, dtype=self.dtype, name="fc2")(f1)))
            f3 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=(jnp.float32 if train else self.dtype), name="fc_bn3")(
                nn.Dense(inplanes // 4, dtype=self.dtype, name="fc3")(f2)))
            f4 = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=(jnp.float32 if train else self.dtype), name="fc_bn4")(
                nn.Dense(inplanes // 2, dtype=self.dtype, name="fc4")(f3)))
            f5 = nn.Dense(inplanes, dtype=self.dtype, name="fc5")(f4)
            feat = feat + f5

        gamma = DepthHead(1, self.dtype, name="depth_head")(feat)  # (B, 1)
        depth = gamma * k_value.reshape(-1, 1)

        if self.use_offset:
            offset = nn.Dense(1, dtype=self.dtype, name="offset_fc")(feat)
            depth = depth + offset * 1000.0

        if self.pred_xy:
            return jnp.concatenate([coord_xy, depth], axis=-1)
        return depth
