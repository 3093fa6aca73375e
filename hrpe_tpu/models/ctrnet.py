"""CtRNet foreground segmentation + keypoint network (sim2real masks).

Re-design of lib/models/ctrnet/keypoint_seg_resnet.py (KeyPointSegNet:
torchvision DeepLabV3-ResNet50 backbone with a 1-class segmentation
classifier and a deconv + spatial-soft-argmax keypoint head,
:103-149) and ctrnet/mask_inference.py (frozen inference wrapper with
ImageNet normalization and 0.5x resize, :13-60).

Components here:
  * DilatedResNet50 trunk (output stride 8: layer3/4 stride->dilation)
  * ASPP (atrous rates 12/24/36 + image pooling)
  * SegHead -> 1-channel logits upsampled to input size
  * KeyPointSegNet -> (seg_logits, keypoints) like the reference
  * seg_mask_inference -> sigmoid mask at half resolution
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.subpixel import SubpixelConvTranspose
from .resnet import Bottleneck

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _bn(train, dtype, name):
    # BN runs in f32 during TRAINING: although flax computes statistics in
    # f32 regardless, a bf16 BN affine in the train step empirically NaN'd
    # the first 256^2 bf16 step on the TPU runtime (round-1 verification).
    # Inference BN is a per-channel affine — safe in the compute dtype.
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=(jnp.float32 if train else dtype), name=name,
    )


class DilatedResNet50(nn.Module):
    """ResNet-50 trunk with output stride 8 (layers 3/4 dilated)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        # torchvision replace_stride_with_dilation=[False, True, True]
        # convention: in a dilated stage the FIRST block keeps the
        # previous stage's dilation (torchvision resnet._make_layer passes
        # previous_dilation to block 0), later blocks use the new one.
        specs = [
            (3, 64, 1, 1, 1),      # (blocks, width, stride, dil0, dil)
            (4, 128, 2, 1, 1),
            (6, 256, 1, 1, 2),
            (3, 512, 1, 2, 4),
        ]
        in_ch = 64
        for stage, (n_blocks, width, stride, dil0, dil) in enumerate(specs):
            for b in range(n_blocks):
                down = b == 0 and (stride != 1 or in_ch != width * 4)
                x = Bottleneck(
                    width, stride if b == 0 else 1, down, self.dtype,
                    dilation=dil0 if b == 0 else dil,
                    name=f"layer{stage+1}_{b}",
                )(x, train)
                in_ch = width * 4
        return x  # (B, H/8, W/8, 2048)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (deeplabv3)."""

    out_ch: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = []
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="b0_conv")(x)
        branches.append(nn.relu(_bn(train, self.dtype, "b0_bn")(y)))
        for i, r in enumerate(self.rates):
            y = nn.Conv(
                self.out_ch, (3, 3), padding=[(r, r)] * 2,
                kernel_dilation=(r, r), use_bias=False, dtype=self.dtype,
                name=f"b{i+1}_conv",
            )(x)
            branches.append(nn.relu(_bn(train, self.dtype, f"b{i+1}_bn")(y)))
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="pool_conv")(g)
        g = nn.relu(_bn(train, self.dtype, "pool_bn")(g))
        g = jnp.broadcast_to(g, x.shape[:3] + (self.out_ch,))
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="proj_conv")(y)
        y = nn.relu(_bn(train, self.dtype, "proj_bn")(y))
        return y


def _resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "bilinear")


class KeyPointSegNet(nn.Module):
    """DeepLabV3 trunk + 1-class seg head + keypoint soft-argmax head."""

    num_keypoints: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        f = DilatedResNet50(self.dtype, name="backbone")(x, train)
        a = ASPP(dtype=self.dtype, name="aspp")(f, train)
        seg = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                      dtype=self.dtype, name="seg_conv")(a)
        seg = nn.relu(_bn(train, self.dtype, "seg_bn")(seg))
        seg_logits = nn.Conv(1, (1, 1), dtype=self.dtype, name="seg_out")(seg)
        seg_logits = _resize_bilinear(seg_logits, (H, W))

        # keypoint head (ref keypoint_seg_resnet.py:10-36,128-143): ONE
        # deconv 2048 -> K (k=4, s=2, p=1, WITH bias) straight off the
        # trunk, spatial soft-argmax over normalized [-1,1] coords, then
        # mapped to pixel coords via (kp + 1) * (W//2, H//2).
        hm = SubpixelConvTranspose(
            self.num_keypoints, use_bias=True, dtype=self.dtype, name="kp_deconv"
        )(f)
        B, h, w, Kk = hm.shape
        p = jax.nn.softmax(
            hm.reshape(B, h * w, Kk).astype(jnp.float32), axis=1
        ).reshape(B, h, w, Kk)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
        ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
        kp_x = (jnp.einsum("bhwk,w->bk", p, xs) + 1.0) * (W // 2)
        kp_y = (jnp.einsum("bhwk,h->bk", p, ys) + 1.0) * (H // 2)
        keypoints = jnp.stack([kp_x, kp_y], axis=-1)  # (B, K, 2) pixels
        return seg_logits[..., 0], keypoints


class SegMaskInference:
    """Frozen mask inference (ref ctrnet/mask_inference.py:13-60).

    Normalizes with ImageNet stats, runs at `scale` resolution, returns a
    sigmoid foreground mask.
    """

    def __init__(self, model: KeyPointSegNet, variables, scale: float = 0.5):
        self.model = model
        self.variables = variables
        self.scale = scale

        def _fn(variables, images):
            x = (images - IMAGENET_MEAN) / IMAGENET_STD
            B, H, W, _ = x.shape
            hw = (int(H * scale), int(W * scale))
            x = _resize_bilinear(x, hw)
            logits, _ = self.model.apply(variables, x, train=False)
            return jax.nn.sigmoid(logits)

        self._fn = jax.jit(_fn)

    def __call__(self, images_01):
        """images_01: (B, H, W, 3) floats in [0,1] -> (B, H*s, W*s) mask."""
        return self._fn(self.variables, images_01)


class CtRNet:
    """Keypoint+segmentation robot pose estimator (ref ctrnet/CtRNet.py:49-193).

    Combines KeyPointSegNet detections with the JAX PnP solver to produce
    base->camera poses from a single frame — the reference's
    `inference_single_image` / BPnP path, with OpenCV replaced by
    hrpe_tpu.pnp. The self-training loop of the reference (:151-193)
    corresponds to engine/sim2real.py in this framework.
    """

    def __init__(self, model: KeyPointSegNet, variables, robot, K):
        import jax.numpy as _jnp

        self.model = model
        self.variables = variables
        self.robot = robot
        self.K = _jnp.asarray(K)

    def inference(self, images_01, joint_angles):
        """images (B,H,W,3) in [0,1] + joint angles (B,dof) ->
        (theta (B,6) axis-angle|trans, seg_mask, keypoints2d)."""
        import jax

        from ..pnp import pnp_pose

        x = (images_01 - IMAGENET_MEAN) / IMAGENET_STD
        seg_logits, kp2d = self.model.apply(self.variables, x, train=False)
        world_pts = self.robot.keypoints_fk_only(joint_angles)
        n = min(kp2d.shape[1], world_pts.shape[1])
        theta = pnp_pose(kp2d[:, :n], world_pts[:, :n], self.K)
        return theta, jax.nn.sigmoid(seg_logits), kp2d


SEG_CAMERAS = ("azure", "kinect", "realsense", "orb")


def seg_checkpoint_path(train_ds_names: str, root: str = "models/panda_segmentation"):
    """Per-camera .pth path selection (ref mask_inference.py:35-44):
    the camera code name is whichever of azure/kinect/realsense/orb
    appears in the training dataset name (ref train_sim2real.py:60-64)."""
    import os

    for code in SEG_CAMERAS:
        if code in train_ds_names:
            return os.path.join(root, f"{code}.pth"), code
    return os.path.join(root, "azure.pth"), "azure"


def build_seg_net(num_keypoints=7, rng=None, image_hw=(240, 320),
                  checkpoint_path=None):
    """Construct + init a KeyPointSegNet.

    checkpoint_path: a reference-format per-camera .pth
    (mask_inference.py:35-44). When given and present, weights are
    imported through checkpoint_io.translate_ctrnet_key (strict: every
    torch tensor must land). When absent, weights stay random — callers
    should warn, as random masks are noise supervision.
    """
    model = KeyPointSegNet(num_keypoints=num_keypoints)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros((1, image_hw[0], image_hw[1], 3))
    variables = jax.jit(lambda r: model.init(r, x, train=False))(rng)
    if checkpoint_path is not None:
        from ..utils.checkpoint_io import (
            import_state_dict,
            load_torch_state_dict,
            translate_ctrnet_key,
        )

        sd = load_torch_state_dict(checkpoint_path)
        variables, report = import_state_dict(
            sd, variables, translate_ctrnet_key, strict=True
        )
    return model, variables
