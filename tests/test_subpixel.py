"""Exactness of the subpixel deconv vs flax nn.ConvTranspose.

The models swap nn.ConvTranspose(C,(4,4),(2,2),'SAME') for the 4x-cheaper
subpixel form (ops/subpixel.py); this must be numerically identical at
every shape the models use (full_net deconv stack 8->64, depth_net xy
branch, ctrnet kp head) or checkpoint-imported zoo weights would diverge.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrpe_tpu.ops.subpixel import (
    SubpixelConvTranspose,
    subpixel_conv_transpose_4x4_s2,
)


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [
        (2, 8, 8, 2048, 256),   # full_net deconv0 (resnet50 feat)
        (2, 16, 16, 256, 256),  # deconv1
        (2, 32, 32, 256, 256),  # deconv2
        (1, 5, 7, 3, 4),        # odd sizes, asymmetric
        (3, 1, 1, 2, 2),        # degenerate 1x1 input
    ],
)
def test_matches_conv_transpose(b, h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    kernel = jnp.asarray(rng.randn(4, 4, cin, cout) * 0.05, jnp.float32)

    ref = jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = subpixel_conv_transpose_4x4_s2(x, kernel)
    assert got.shape == ref.shape == (b, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_module_param_tree_matches_conv_transpose():
    """Same param name/shape/init family => checkpoint-io compatible."""
    x = jnp.zeros((1, 4, 4, 8), jnp.float32)
    v_ref = nn.ConvTranspose(
        16, (4, 4), strides=(2, 2), padding="SAME", use_bias=False
    ).init(jax.random.PRNGKey(0), x)
    v_sub = SubpixelConvTranspose(16).init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, v_ref) == jax.tree.map(jnp.shape, v_sub)
    # identical init stream => identical initial weights
    np.testing.assert_array_equal(
        np.asarray(v_ref["params"]["kernel"]), np.asarray(v_sub["params"]["kernel"])
    )

    y_ref = nn.ConvTranspose(
        16, (4, 4), strides=(2, 2), padding="SAME", use_bias=False
    ).apply(v_ref, jnp.ones((2, 4, 4, 8)))
    y_sub = SubpixelConvTranspose(16).apply(v_sub, jnp.ones((2, 4, 4, 8)))
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
