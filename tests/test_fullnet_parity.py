"""RootNetwithRegInt end-to-end numerical parity vs the reference torch model.

Builds the REFERENCE's RootNetwithRegInt (lib/models/full_net.py:17-466,
random weights, CPU), exports its state_dict, imports it through
translate_fullnet_key into our flax model, and compares every forward
output (pose/rot/trans/root_uv/depth/uvd/xyz_int) on the same inputs.

This is the only test that exercises the deconv spatial-flip, the
depth_layer 1x1-conv->Dense mapping, and the fc-head mappings of
checkpoint_io.translate_fullnet_key all at once — i.e. it proves a real
zoo .pk would load correctly before one is ever on disk (VERDICT r1 #3).

The reference model is constructed with its URDFRobot stubbed out (that
import chain needs pyrender/trimesh/networkx, absent here; FK parity is
golden-tested separately in test_kinematics) and hrnet pretrain=False, so
no external files are needed. xyz_fk is excluded from the comparison.

Skipped when /root/reference is not present.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_harness import make_ref_model

pytestmark = [pytest.mark.slow] + [pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lib")), reason="reference not mounted"
)]


@pytest.mark.parametrize("backbone", ["resnet50", "hrnet32"])
def test_fullnet_forward_parity(backbone):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from hrpe_tpu.models import FullNetConfig, build_full_net
    from hrpe_tpu.utils.checkpoint_io import import_state_dict, translate_fullnet_key

    # 256^2 is the ONLY size the reference supports: it hardcodes
    # depth_dim=64 (full_net.py:66) and its decomposed integral decode
    # shares one range_tensor across W/H/D (integral.py:128-134), which
    # only lines up when W == H == D == 64, i.e. image_size 256. Shrinking
    # to 128^2 makes the reference itself throw.
    S = 256
    ref = make_ref_model(backbone, image_size=S)

    B = 2
    rng = np.random.RandomState(1)
    x = rng.rand(B, 3, S, S).astype(np.float32)
    k = (1000.0 + 200.0 * rng.rand(B)).astype(np.float32)
    K = np.tile(
        np.asarray([[320.0, 0, 64.0], [0, 320.0, 64.0], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    with torch.no_grad():
        t_out = ref(
            torch.from_numpy(x), torch.from_numpy(x),
            torch.from_numpy(k), torch.from_numpy(K),
        )
    t_pose, t_rot, t_trans, t_root_uv, t_depth, t_uvd, t_xyz_int = [
        v.numpy() for v in t_out[:7]
    ]

    cfg = FullNetConfig(
        robot_type="panda", backbone_name=backbone,
        rootnet_backbone_name="hrnet32", image_size=S,
    )
    fmodel = build_full_net(cfg)  # f32 for parity
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    kj, Kj = jnp.asarray(k), jnp.asarray(K)
    variables = jax.jit(
        lambda r: fmodel.init(r, xn, xn, kj, Kj, train=False)
    )(jax.random.PRNGKey(0))

    sd = {kk: v.detach().numpy() for kk, v in ref.state_dict().items()}
    new_vars, report = import_state_dict(
        sd, variables, lambda kk: translate_fullnet_key(kk, backbone.startswith("resnet"))
    )
    # init_pose / init_rot are buffers, not parameters in our model
    skipped = [s for s in report["skipped"] if s not in ("init_pose", "init_rot")]
    assert not skipped, skipped[:8]
    assert not report["mismatched"], report["mismatched"][:8]

    out = fmodel.apply(new_vars, xn, xn, kj, Kj, train=False)

    np.testing.assert_allclose(t_depth, np.asarray(out.depth), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(t_uvd, np.asarray(out.uvd), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(t_root_uv, np.asarray(out.root_uv), atol=2e-2, rtol=1e-3)
    # rtol 5e-3: trans back-projects uv*depth, amplifying conv summation-order
    # noise (the subpixel deconv reassociates sums); random weights put
    # depth at ~450 m so atol is meaningless here, rtol is what matters
    np.testing.assert_allclose(t_trans, np.asarray(out.trans), atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(t_xyz_int, np.asarray(out.xyz_int), atol=2e-3, rtol=5e-3)
    np.testing.assert_allclose(t_pose, np.asarray(out.pose), atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(t_rot, np.asarray(out.rot), atol=5e-3, rtol=1e-3)
