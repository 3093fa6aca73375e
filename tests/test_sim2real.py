"""Sim2real pipeline test: mask-consistency step runs and shapes hold."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures import make_pickle_dataset
from hrpe_tpu.config import make_default_config
from hrpe_tpu.data.dream import DreamDataset
from hrpe_tpu.data.loader import DataLoader
from hrpe_tpu.engine.schedules import make_optimizer
from hrpe_tpu.engine.sim2real import make_sim2real_step
from hrpe_tpu.engine.train_state import create_train_state
from hrpe_tpu.kinematics import load_robot
from hrpe_tpu.models import FullNetConfig, build_full_net
from hrpe_tpu.render import RobotMesh, default_link_meshes


def test_sim2real_step(tmp_path):
    d = tmp_path / "dofbot-real"
    make_pickle_dataset(d, "dofbot", n=4)
    ds = DreamDataset(
        str(d), rootnet_resize_hw=(64, 64), other_resize_hw=(64, 64),
        color_jitter=False, rgb_augmentation=False, occlusion_augmentation=False,
        include_original=True,
    )
    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)))

    cfg = make_default_config()
    cfg.urdf_robot_name = "dofbot"
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.image_size = cfg.other_image_size = cfg.rootnet_image_size = 64.0
    cfg.batch_size = 4
    cfg.reference_keypoint_id = 1
    cfg.lr = 1e-6
    cfg.iou_loss_weight = 1.0
    cfg.align_3d_loss_weight = 1.0
    cfg.mask_loss_weight = 1.0
    cfg.scale_loss_weight = 0.1

    robot = load_robot("dofbot")
    model = build_full_net(
        FullNetConfig(
            robot_type="dofbot", backbone_name="resnet18",
            rootnet_backbone_name="resnet18", image_size=64,
            reference_keypoint_id=1, p_dropout=0.0,
        )
    )
    tx = make_optimizer(cfg)
    B, S = 4, 64
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((B, S, S, 3)), jnp.zeros((B, S, S, 3)), jnp.ones((B,)),
         jnp.asarray(batch["other_K"])),
    )
    rm = RobotMesh(robot, default_link_meshes(robot))
    render_hw = (24, 32)
    step = make_sim2real_step(cfg, model, tx, robot, rm, render_hw)

    images_orig = batch.pop("images_original")
    # stand-in seg masks (a frozen CtRNet provides these in production)
    seg = jnp.ones((B,) + render_hw, jnp.float32) * 0.3
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state2, loss_dict = step(state, batch, seg, jax.random.PRNGKey(1))
    for k in ["loss", "loss_mask", "loss_iou", "loss_scale", "loss_align"]:
        assert np.isfinite(float(loss_dict[k])), k
    # params actually changed
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_worst_case_visual_dump(tmp_path):
    # the epoch-end worst-IoU overlay (ref train_sim2real.py:587-594):
    # render the worst sample through make_render_fn and write the PNG
    import os

    from hrpe_tpu.engine.sim2real import dump_worst_overlay, make_render_fn

    d = tmp_path / "dofbot-real2"
    make_pickle_dataset(d, "dofbot", n=2)
    ds = DreamDataset(
        str(d), rootnet_resize_hw=(64, 64), other_resize_hw=(64, 64),
        color_jitter=False, rgb_augmentation=False, occlusion_augmentation=False,
        include_original=True,
    )
    batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)))

    cfg = make_default_config()
    cfg.urdf_robot_name = "dofbot"
    cfg.reference_keypoint_id = 1
    robot = load_robot("dofbot")
    model = build_full_net(
        FullNetConfig(
            robot_type="dofbot", backbone_name="resnet18",
            rootnet_backbone_name="resnet18", image_size=64,
            reference_keypoint_id=1, p_dropout=0.0,
        )
    )
    B, S = 2, 64
    variables = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((B, S, S, 3)), jnp.zeros((B, S, S, 3)),
            jnp.ones((B,)), jnp.asarray(batch["other_K"]), train=False,
        )
    )(jax.random.PRNGKey(0))

    rm = RobotMesh(robot, default_link_meshes(robot))
    render_hw = (24, 32)
    images_orig = batch.pop("images_original")
    render_fn = make_render_fn(cfg, model, robot, rm, render_hw)
    masks = render_fn(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    assert masks.shape == (B,) + render_hw

    seg = np.zeros(render_hw, np.float32)
    seg[5:15, 8:20] = 1.0
    path = dump_worst_overlay(
        str(tmp_path), 3, np.asarray(images_orig[0]), seg,
        np.asarray(masks[0]), 0.123,
    )
    assert os.path.exists(path) and path.endswith(".png")
