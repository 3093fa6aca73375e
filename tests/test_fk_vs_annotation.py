"""FK-vs-annotation cross-check for all four robots, both dialects.

The reference's own kinematics sanity check (dataset_load_test.py:152-159)
run as a pytest: for every robot, build a dataset sample, read back
(jointpose, TCO, keypoints_3d) through the full DreamDataset parsing path,
and assert that re-rooted FK from the GT joints/rot/trans reproduces the
annotated 3D keypoints. This validates the dataset-parsing <-> FK <->
re-rooting contract per robot (VERDICT r1 #6).

Caveat (kinematics/robots.py:15-18): baxter/dofbot geometry tables are
best-effort public-spec reconstructions; the fixtures derive annotations
through the same chains, so this test pins pipeline self-consistency and
conventions, not absolute link lengths. Absolute validation needs the real
DREAM/Isaac annotations — scripts/dataset_load_test.py performs the same
check against any dataset on disk.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
import jax.numpy as jnp
from fixtures import make_json_dataset, make_pickle_dataset

from hrpe_tpu.data.dream import DreamDataset
from hrpe_tpu.kinematics import load_robot
from hrpe_tpu.utils.geometry import rotmat_to_rot6d


@pytest.mark.parametrize(
    "robot_name,dialect",
    [
        ("panda", "json"),
        ("kuka", "json"),
        ("baxter", "json"),
        ("dofbot", "pickle"),
        ("panda", "pickle"),
    ],
)
def test_fk_matches_annotation(tmp_path, robot_name, dialect):
    d = tmp_path / f"{robot_name}_synth_test_dr"
    if dialect == "json":
        make_json_dataset(d, robot_name, n=2)
    else:
        make_pickle_dataset(d, robot_name, n=2)
    ds = DreamDataset(
        str(d), color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False, robot=robot_name,
    )
    robot = load_robot(robot_name)
    for i in range(len(ds)):
        s = ds[i]
        q = jnp.asarray(s["jointpose"])[None]
        TCO = s["TCO"]
        r6 = rotmat_to_rot6d(jnp.asarray(TCO[:3, :3])[None])
        t = jnp.asarray(TCO[:3, 3])[None]
        kp_gt = np.asarray(s["other"]["keypoints_3d"])
        if dialect == "json":
            # DREAM json TCO = base pose: exact reconstruction
            kp_fk = np.asarray(robot.keypoints_base(q, r6, t))[0]
            err = np.linalg.norm(kp_fk - kp_gt, axis=-1)
            assert err.max() < 5e-3, (robot_name, err.max())
        else:
            # Isaac pickle TCO = ROOT-LINK (keypoint 1) pose: link1's
            # camera-frame rotation + link1 translation (the reference
            # consumes it directly as the root pose with
            # reference_keypoint_id=1, function.py:86-93). Exact
            # invariant — this is precisely the training FK head's
            # convention: re-rooted FK from (q, TCO) reproduces the
            # annotated keypoints.
            kp_root = np.asarray(robot.keypoints_root(q, r6, t, root=1))[0]
            err_root = np.linalg.norm(kp_root - kp_gt, axis=-1)
            assert err_root.max() < 5e-3, (robot_name, err_root.max())
            # base pose recovery: TCO @ inv(TWL_link1) gives the base
            # frame; base FK must also reproduce the keypoints exactly
            TWL1 = np.asarray(robot.keypoint_poses(q))[0, 1]
            R_base = np.asarray(TCO[:3, :3]) @ TWL1[:3, :3].T
            t_base = np.asarray(TCO[:3, 3]) - R_base @ TWL1[:3, 3]
            kp_fk = np.asarray(
                robot.keypoints_base(
                    q,
                    rotmat_to_rot6d(jnp.asarray(R_base)[None]),
                    jnp.asarray(t_base)[None],
                )
            )[0]
            err = np.linalg.norm(kp_fk - kp_gt, axis=-1)
            assert err.max() < 5e-3, (robot_name, err.max())
