"""FK tests: limb-length goldens, re-rooting identities, URDF parser."""

import jax.numpy as jnp
import numpy as np
import pytest

from hrpe_tpu.kinematics import load_robot, chain_from_urdf
from hrpe_tpu.utils.geometry import rotmat_to_rot6d

# golden limb lengths from the reference (const.py:108-129)
PANDA_LIMBS = [0.3330, 0.3160, 0.0825, 0.39276, 0.0880, 0.1070]
KUKA_LIMBS = [0.1500, 0.1900, 0.2100, 0.1900, 0.2100, 0.19946, 0.10122]


def _limb_lengths(robot, q):
    kps = np.asarray(robot.keypoints_fk_only(q))[0]
    return np.linalg.norm(np.diff(kps, axis=0), axis=-1)


def test_panda_limb_lengths_golden():
    robot = load_robot("panda")
    assert robot.dof == 8 and robot.num_keypoints == 7
    # limb lengths are invariant to joint angles for this keypoint set
    for seed in range(3):
        q = jnp.asarray(np.random.RandomState(seed).uniform(-1, 1, (1, 8)), jnp.float32)
        np.testing.assert_allclose(_limb_lengths(robot, q), PANDA_LIMBS, atol=2e-5)


def test_kuka_limb_lengths_golden():
    robot = load_robot("kuka")
    assert robot.dof == 7 and robot.num_keypoints == 8
    q = jnp.zeros((1, 7), jnp.float32)
    np.testing.assert_allclose(_limb_lengths(robot, q), KUKA_LIMBS, atol=2e-5)


def test_baxter_shape_and_offsets():
    robot = load_robot("baxter")
    assert robot.dof == 15 and robot.num_keypoints == 17
    q = jnp.zeros((2, 15), jnp.float32)
    kps = robot.keypoints_fk_only(q)
    assert kps.shape == (2, 17, 3)
    kn = np.asarray(kps)
    # left/right keypoints are mirror-symmetric about y=0 at zero pose
    np.testing.assert_allclose(kn[0, 1, [0, 2]], kn[0, 2, [0, 2]], atol=1e-5)
    np.testing.assert_allclose(kn[0, 1, 1], -kn[0, 2, 1], atol=1e-5)


def test_dofbot_mimic_gripper():
    robot = load_robot("dofbot")
    assert robot.dof == 6 and robot.num_keypoints == 8
    q = jnp.zeros((1, 6), jnp.float32)
    q = q.at[0, 5].set(0.4)
    kps = np.asarray(robot.keypoints_fk_only(q))[0]
    # fingers move symmetrically (mirror-mimic joint)
    assert abs(kps[6, 0] + kps[7, 0]) < 1e-5


def test_rerooting_identity():
    # keypoints_root with the root's own camera pose must reproduce base-frame
    # FK transformed by the base pose, for any root choice
    robot = load_robot("panda")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 8)), jnp.float32)
    # base->camera pose
    rot6d = jnp.asarray(
        rotmat_to_rot6d(jnp.eye(3)[None]).repeat(4, axis=0), jnp.float32
    )
    trans = jnp.asarray(rng.randn(4, 3), jnp.float32)
    base_kps = robot.keypoints_base(q, rot6d, trans)

    root = 3
    # compute the root->camera pose implied by (rot, trans) and re-run
    TWL = robot.keypoint_poses(q)
    base2cam = np.zeros((4, 4, 4), np.float32)
    base2cam[:, :3, :3] = np.eye(3)
    base2cam[:, :3, 3] = np.asarray(trans)
    base2cam[:, 3, 3] = 1
    root2cam = base2cam @ np.asarray(TWL)[:, root]
    r6 = rotmat_to_rot6d(jnp.asarray(root2cam[:, :3, :3]))
    t = jnp.asarray(root2cam[:, :3, 3])
    root_kps = robot.keypoints_root(q, r6, t, root=root)
    np.testing.assert_allclose(np.asarray(base_kps), np.asarray(root_kps), atol=1e-4)


def test_fk_only_root_is_zero_at_root():
    robot = load_robot("kuka")
    q = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (3, 7)), jnp.float32)
    for root in [0, 2, 5]:
        kps = np.asarray(robot.keypoints_fk_only(q, root=root))
        np.testing.assert_allclose(kps[:, root], 0.0, atol=1e-5)


def test_rotation_at_root():
    robot = load_robot("panda")
    q = jnp.zeros((2, 8), jnp.float32)
    r6 = rotmat_to_rot6d(jnp.eye(3)[None]).repeat(2, axis=0)
    t = jnp.zeros((2, 3), jnp.float32)
    out = robot.rotation_at_root(q, r6, t, root=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(r6))
    out3 = robot.rotation_at_root(q, r6, t, root=3)
    assert out3.shape == (2, 6)


def test_urdf_parser_matches_builtin(tmp_path):
    # author a small 2-dof URDF and check parser-FK vs hand computation
    urdf = tmp_path / "mini.urdf"
    urdf.write_text(
        """
<robot name="mini">
  <link name="base"/><link name="l1"/><link name="l2"/><link name="l3"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.5" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0.3 0 0" rpy="1.5707963 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3"/>
  </joint>
  <joint name="j3" type="fixed">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0 0.2 0" rpy="0 0 0"/>
  </joint>
</robot>
"""
    )
    chain = chain_from_urdf(str(urdf), ["base", "l1", "l2", "l3"], ["j1", "j2"])
    assert chain.dof == 2
    q = jnp.asarray([[np.pi / 2, 0.0]], jnp.float32)
    kps = np.asarray(chain.keypoints_fk_only(q))[0]
    np.testing.assert_allclose(kps[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(kps[1], [0, 0, 0.5], atol=1e-6)
    # j1 rotated 90deg about z: the l2 origin (0.3, 0, 0) maps to (0, 0.3, 0.5)
    np.testing.assert_allclose(kps[2], [0, 0.3, 0.5], atol=1e-6)
    # l3: +0.2 along l2's y-axis; l2 frame rpy (pi/2,0,0) then rotated by j1
    np.testing.assert_allclose(kps[3], [0, 0.3, 0.7], atol=1e-6)


def test_fk_jit_and_grad():
    import jax

    robot = load_robot("panda")
    q = jnp.zeros((2, 8), jnp.float32)

    @jax.jit
    def loss(q):
        return jnp.sum(robot.keypoints_fk_only(q) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
