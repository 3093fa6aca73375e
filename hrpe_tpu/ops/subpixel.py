"""Subpixel (depth-to-space) transposed convolution for the MXU.

`nn.ConvTranspose(C, (4,4), strides=(2,2), padding='SAME')` — the deconv
the reference uses everywhere (torch ConvTranspose2d(k=4, s=2, p=1),
lib/models/full_net.py:117-138, depth_net.py:34-42,
ctrnet/keypoint_seg_resnet.py:116-126) — is lowered by XLA as a conv over
a 2x-dilated input: 4x4 taps where 3 of 4 are zeros, i.e. 4x the true
FLOPs. The subpixel decomposition computes exactly the same map as one
dense 2x2 conv with 4x output channels followed by depth-to-space:

    out[2g-1+p, 2h-1+q] = sum_{d,e in {0,1}} x[g-1+d, h-1+e] * w[2d+1-p, 2e+1-q]

(derived from lax.conv_transpose's flipped-kernel convolution semantics,
impulse-response-verified: out[o] collects x[m]*w[k] at o = 2m + 2 - k).
This is 4x fewer FLOPs AND a wider matmul N-dim (4*C lanes), both wins on
the MXU. Exactness vs nn.ConvTranspose is asserted in
tests/test_subpixel.py at every shape the models use.

The parameter tree (a single 'kernel' of shape (4,4,Cin,Cout), lecun
normal) is IDENTICAL to nn.ConvTranspose's, so torch checkpoint import
(utils/checkpoint_io.py) and existing orbax checkpoints are unaffected.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def subpixel_conv_transpose_4x4_s2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Apply a k=4 s=2 'SAME' transposed conv via 2x2 conv + depth-to-space.

    x: (B, H, W, Cin); kernel: (4, 4, Cin, Cout) in nn.ConvTranspose layout.
    Returns (B, 2H, 2W, Cout), bit-comparable to
    nn.ConvTranspose(Cout, (4,4), strides=(2,2), padding='SAME', use_bias=False).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (4, 4), kernel.shape
    # (d, p', e, q', ci, co) with tap index = 2*d + p'; phase p uses
    # tap 2*d + 1 - p, i.e. the p' axis reversed.
    w4 = kernel.reshape(2, 2, 2, 2, cin, cout)[:, ::-1, :, ::-1]
    # -> (d, e, ci, p, q, co) -> 2x2 conv producing 4 phase groups
    w2 = jnp.transpose(w4, (0, 2, 4, 1, 3, 5)).reshape(2, 2, cin, 4 * cout)
    y = jax.lax.conv_general_dilated(
        x, w2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, h, w, _ = y.shape  # h = H+1: window g covers out rows 2g-1, 2g
    y = y.reshape(b, h, w, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, cout)
    return y[:, 1 : 2 * h - 1, 1 : 2 * w - 1, :]


class SubpixelConvTranspose(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (4,4), strides=(2,2),
    padding='SAME') with 4x fewer FLOPs on TPU."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (4, 4, x.shape[-1], self.features),
            jnp.float32,
        )
        y = subpixel_conv_transpose_4x4_s2(
            x.astype(self.dtype), kernel.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y
