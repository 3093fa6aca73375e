"""Packed-HRNet exactness: packed inference == plain inference."""

import numpy as np
import jax
import jax.numpy as jnp

from hrpe_tpu.models.hrnet import HRNet
from hrpe_tpu.models.hrnet_packed import (
    HRNetPacked,
    depth_to_space,
    pack_conv_kernel,
    pack_hrnet_variables,
    space_to_depth,
)


import pytest

pytestmark = pytest.mark.slow  # heavy compile; excluded from the default fast shard

def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


def test_packed_conv_exact():
    # packed conv on packed input == plain conv on plain input
    rng = np.random.RandomState(1)
    C = 4
    x = jnp.asarray(rng.randn(2, 8, 8, C), jnp.float32)
    W = rng.randn(3, 3, C, C).astype(np.float32)
    y_plain = jax.lax.conv_general_dilated(
        x, jnp.asarray(W), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    Wp = jnp.asarray(pack_conv_kernel(W))
    y_packed = jax.lax.conv_general_dilated(
        space_to_depth(x), Wp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(depth_to_space(y_packed)), np.asarray(y_plain), atol=1e-4
    )


def test_hrnet_packed_matches_plain():
    rng = jax.random.PRNGKey(0)
    plain = HRNet(32, 5, 8, generate_hm=True, generate_feat=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = plain.init(rng, x, False)
    # randomize batch stats so BN tiling is exercised
    import flax

    flat = flax.traverse_util.flatten_dict(variables["batch_stats"])
    k = jax.random.PRNGKey(2)
    new = {}
    for p, v in flat.items():
        k, sub = jax.random.split(k)
        if p[-1] == "mean":
            new[p] = jax.random.uniform(sub, v.shape, minval=-0.1, maxval=0.1)
        else:
            new[p] = jax.random.uniform(sub, v.shape, minval=0.9, maxval=1.1)
    variables = {
        "params": variables["params"],
        "batch_stats": flax.traverse_util.unflatten_dict(new),
    }

    hm_p, feat_p = plain.apply(variables, x, False)

    packed_model = HRNetPacked(32, 5, 8, generate_hm=True, generate_feat=True)
    packed_vars = pack_hrnet_variables(variables, width=32)
    hm_q, feat_q = packed_model.apply(packed_vars, x, False)

    np.testing.assert_allclose(np.asarray(feat_p), np.asarray(feat_q), atol=3e-3)
    np.testing.assert_allclose(np.asarray(hm_p), np.asarray(hm_q), atol=3e-3)
