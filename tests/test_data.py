"""Data pipeline tests: both dialects, crop/K consistency, FK cross-check.

The FK-vs-annotation cross-check reproduces the reference's only
kinematics validation (scripts/dataset_load_test.py:152-159) as a real
test: dataset 3D keypoints must match the chain FK at the GT pose.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fixtures import make_json_dataset, make_pickle_dataset
from hrpe_tpu.data.dream import DreamDataset
from hrpe_tpu.data.loader import DataLoader, PartialSampler
from hrpe_tpu.kinematics import load_robot
from hrpe_tpu.utils.geometry import project_points, rotmat_to_rot6d


@pytest.fixture(scope="module")
def panda_json_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("dream") / "synthetic" / "panda_synth_train_dr"
    make_json_dataset(d, "panda", n=4)
    # fixture writes meters; dataset applies scale=0.01 for 'synthetic'
    # paths, so store in cm like real DREAM: regenerate with cm locations
    import json as J

    for p in d.glob("*.json"):
        if p.name.startswith("_"):
            continue
        ann = J.loads(p.read_text())
        o = ann["objects"][0]
        o["location"] = [v * 100 for v in o["location"]]
        for kp in o["keypoints"]:
            kp["location"] = [v * 100 for v in kp["location"]]
        p.write_text(J.dumps(ann))
    return d


@pytest.fixture(scope="module")
def dofbot_pkl_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("isaac") / "dofbot_synth_train_dr"
    make_pickle_dataset(d, "dofbot", n=4)
    return d


def _check_sample_contract(s, nkpt, dof):
    assert s["root"]["images"].shape == (256, 256, 3)
    assert s["other"]["images"].shape == (256, 256, 3)
    assert s["jointpose"].shape == (dof,)
    assert s["TCO"].shape == (4, 4)
    assert s["other"]["keypoints_2d"].shape == (nkpt, 2)
    assert s["other"]["keypoints_3d"].shape == (nkpt, 3)
    assert s["valid_mask"].shape == (nkpt,)


def _check_projection_consistency(s):
    # crop-space K must reproject the (camera-frame) 3D keypoints onto the
    # crop-space 2D keypoints
    kp3d = jnp.asarray(s["other"]["keypoints_3d"])[None]
    K = jnp.asarray(s["other"]["K"])[None]
    uv = np.asarray(project_points(K, kp3d))[0]
    np.testing.assert_allclose(uv, s["other"]["keypoints_2d"], atol=0.5)


def test_json_dialect_panda(panda_json_ds):
    ds = DreamDataset(
        str(panda_json_ds), color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False,
    )
    assert len(ds) == 4
    s = ds[0]
    _check_sample_contract(s, nkpt=7, dof=8)
    _check_projection_consistency(s)

    # FK cross-check (ref dataset_load_test.py:152-159): FK at GT joints +
    # TCO pose must land on the annotated camera-frame keypoints
    robot = load_robot("panda")
    q = jnp.asarray(s["jointpose"])[None]
    TCO = s["TCO"]
    r6 = rotmat_to_rot6d(jnp.asarray(TCO[:3, :3])[None])
    t = jnp.asarray(TCO[:3, 3])[None]
    kp_fk = np.asarray(robot.keypoints_base(q, r6, t))[0]
    np.testing.assert_allclose(
        kp_fk, s["keypoints_3d_original"], atol=2e-3
    )


def test_pickle_dialect_dofbot(dofbot_pkl_ds):
    ds = DreamDataset(
        str(dofbot_pkl_ds), color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False,
    )
    assert len(ds) == 4
    s = ds[0]
    _check_sample_contract(s, nkpt=8, dof=6)
    _check_projection_consistency(s)
    # TCO translation equals the link1 camera position (dialect definition,
    # ref dream.py:204-211)
    np.testing.assert_allclose(
        s["TCO"][:3, 3], s["keypoints_3d_original"][1], atol=1e-5
    )


def test_loader_batching(dofbot_pkl_ds):
    ds = DreamDataset(
        str(dofbot_pkl_ds), color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False,
    )
    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["other_images"].shape == (2, 256, 256, 3)
    assert b["root_K"].shape == (2, 3, 3)
    assert b["jointpose"].shape == (2, 6)
    assert b["other_valid_mask_crop"].shape == (2, 8)


def test_partial_sampler(dofbot_pkl_ds):
    ds = DreamDataset(
        str(dofbot_pkl_ds), color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False,
    )
    loader = DataLoader(ds, batch_size=2, sampler=PartialSampler(len(ds), 2))
    assert len(list(loader)) == 1


def test_augmentations_deterministic(dofbot_pkl_ds):
    ds1 = DreamDataset(str(dofbot_pkl_ds), seed=7)
    ds2 = DreamDataset(str(dofbot_pkl_ds), seed=7)
    s1 = ds1[0]
    s2 = ds2[0]
    np.testing.assert_array_equal(s1["other"]["images"], s2["other"]["images"])
