"""Wiring tests for every full-net head variant and robot family.

The reference exposes these via config flags (full_net.py:91-138,
396-444); each variant here is built tiny (resnet18, 64^2) and forwarded
once — catching head-wiring regressions without the cost of a train step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hrpe_tpu.models import FullNetConfig, build_full_net
from hrpe_tpu.models.hrnet import HRNet


import pytest

pytestmark = pytest.mark.slow  # heavy compile; excluded from the default fast shard

def _forward(cfg):
    model = build_full_net(cfg)
    B, S = 2, 64
    x = jnp.zeros((B, S, S, 3))
    k = jnp.ones((B,))
    K = jnp.tile(jnp.asarray([[320.0, 0, 32.0], [0, 320.0, 32.0], [0, 0, 1.0]]), (B, 1, 1))
    v = model.init(jax.random.PRNGKey(0), x, x, k, K, train=False)
    out = model.apply(v, x, x, k, K, train=False)
    return out


BASE = dict(
    backbone_name="resnet18", rootnet_backbone_name="resnet18",
    image_size=64, p_dropout=0.0,
)


@pytest.mark.parametrize("robot,dof,nkpt,ref_id", [
    ("panda", 8, 7, 3),
    ("kuka", 7, 8, 3),
    ("baxter", 15, 17, 3),
    ("dofbot", 6, 8, 1),
])
def test_all_robot_families(robot, dof, nkpt, ref_id):
    out = _forward(FullNetConfig(robot_type=robot, reference_keypoint_id=ref_id, **BASE))
    assert out["pose"].shape == (2, dof)
    assert out["xyz_fk"].shape == (2, nkpt, 3)
    assert np.isfinite(np.asarray(out["xyz_fk"])).all()


def test_direct_reg_rot():
    out = _forward(FullNetConfig(robot_type="dofbot", reference_keypoint_id=1,
                                 direct_reg_rot=True, **BASE))
    assert out["rot"].shape == (2, 6)


def test_rot_iterative_matmul():
    out = _forward(FullNetConfig(robot_type="dofbot", reference_keypoint_id=1,
                                 rot_iterative_matmul=True, **BASE))
    # iterative-matmul keeps the 6d rep on the rotation manifold
    from hrpe_tpu.utils.geometry import rot6d_to_rotmat

    R = np.asarray(rot6d_to_rotmat(out["rot"]))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_reg_joint_map():
    out = _forward(FullNetConfig(robot_type="dofbot", reference_keypoint_id=1,
                                 reg_joint_map=True, joint_conv_dim=(64, 64, 64),
                                 **BASE))
    from hrpe_tpu.data.const import JOINT_BOUNDS

    p = np.asarray(out["pose"])
    b = JOINT_BOUNDS["dofbot"]
    assert (p >= b[None, :, 0] - 1e-5).all() and (p <= b[None, :, 1] + 1e-5).all()


def test_multi_kp():
    out = _forward(FullNetConfig(robot_type="dofbot", reference_keypoint_id=1,
                                 multi_kp=True, kps_need_depth=(0, 1, 2), **BASE))
    assert out["depths"].shape == (2, 3)


def test_add_fc():
    out = _forward(FullNetConfig(robot_type="dofbot", reference_keypoint_id=1,
                                 add_fc=True, **BASE))
    assert out["depth"].shape == (2, 1)


def test_base_root_zero():
    out = _forward(FullNetConfig(robot_type="panda", reference_keypoint_id=0,
                                 fix_root=True, **BASE))
    assert out["xyz_fk"].shape == (2, 7, 3)


def test_hrnet_w48_builds():
    model = HRNet(48, 7, 8, generate_hm=True, generate_feat=True)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, False)
    hm, feat = model.apply(v, x, False)
    assert hm.shape == (1, 16, 16, 56)
    assert feat.shape == (1, 2048)
