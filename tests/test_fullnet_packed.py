"""Full-net packed-inference twin matches the plain model."""

import numpy as np
import jax
import jax.numpy as jnp

from hrpe_tpu.models import FullNetConfig, build_full_net
from hrpe_tpu.models.full_net import pack_full_net_variables


import pytest

pytestmark = pytest.mark.slow  # heavy compile; excluded from the default fast shard

def test_packed_full_net_matches_plain():
    cfg = FullNetConfig(
        robot_type="dofbot", backbone_name="resnet18",
        rootnet_backbone_name="hrnet32", image_size=64,
        reference_keypoint_id=1, p_dropout=0.0,
    )
    plain = build_full_net(cfg)
    packed = build_full_net(cfg, packed_inference=True)
    B = 2
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 64, 64, 3))
    k = jnp.full((B,), 1000.0)
    K = jnp.tile(jnp.asarray([[320.0, 0, 32.0], [0, 320.0, 32.0], [0, 0, 1.0]]), (B, 1, 1))
    variables = plain.init(jax.random.PRNGKey(1), x, x, k, K, train=False)
    out_p = plain.apply(variables, x, x, k, K, train=False)
    out_q = packed.apply(
        pack_full_net_variables(jax.device_get(variables)), x, x, k, K, train=False
    )
    for key in out_p:
        np.testing.assert_allclose(
            np.asarray(out_p[key]), np.asarray(out_q[key]), atol=3e-3,
            err_msg=key,
        )
