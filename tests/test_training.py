"""End-to-end training tests on the 8-device virtual CPU mesh.

Covers what the reference never tests without hardware (SURVEY.md §4):
the full train step (GT assembly + forward + 10 losses + adam update)
compiled over a data-parallel mesh, loss decrease on fixture data, the
depthnet pipeline, and eval metrics production.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures import make_pickle_dataset
from hrpe_tpu.config import make_default_config
from hrpe_tpu.data.dream import DreamDataset
from hrpe_tpu.data.loader import DataLoader
from hrpe_tpu.engine.schedules import make_optimizer, lr_factor
from hrpe_tpu.engine.train_state import (
    create_train_state,
    make_depthnet_step,
    make_full_net_eval,
    make_full_net_step,
    set_learning_rate,
)
from hrpe_tpu.kinematics import load_robot
from hrpe_tpu.models import FullNetConfig, RootNet, build_full_net
from hrpe_tpu.parallel import make_mesh, shard_batch


def small_cfg():
    cfg = make_default_config()
    cfg.urdf_robot_name = "dofbot"
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.image_size = 64.0
    cfg.other_image_size = 64.0
    cfg.rootnet_image_size = 64.0
    cfg.batch_size = 8
    cfg.reference_keypoint_id = 1
    cfg.use_extended_bbox = True
    cfg.lr = 2e-4
    for w in [
        "pose", "rot", "trans", "uv", "kp2d", "kp3d", "kp2d_int", "kp3d_int"
    ]:
        setattr(cfg, f"{w}_loss_weight", 1.0)
    cfg.depth_loss_weight = 10.0
    return cfg


@pytest.fixture(scope="module")
def fixture_batch(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds") / "dofbot_synth_train_dr"
    make_pickle_dataset(d, "dofbot", n=8)
    ds = DreamDataset(
        str(d), rootnet_resize_hw=(64, 64), other_resize_hw=(64, 64),
        color_jitter=False, rgb_augmentation=False, occlusion_augmentation=False,
    )
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=2)
    return next(iter(loader))


def _model_cfg():
    return FullNetConfig(
        robot_type="dofbot", backbone_name="resnet18",
        rootnet_backbone_name="resnet18", image_size=64,
        reference_keypoint_id=1, p_dropout=0.0,
    )


def test_full_train_step_loss_decreases(fixture_batch):
    cfg = small_cfg()
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8  # virtual CPU mesh active
    model = build_full_net(_model_cfg())
    robot = load_robot("dofbot")
    tx = make_optimizer(cfg)
    B, S = 8, 64
    K0 = jnp.asarray(fixture_batch["other_K"])
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((B, S, S, 3)), jnp.zeros((B, S, S, 3)), jnp.ones((B,)), K0),
    )
    step = make_full_net_step(cfg, model, tx, robot, use_pnp=False)
    batch = shard_batch(mesh, fixture_batch)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(16):
        rng, sub = jax.random.split(rng)
        state, loss_dict = step(state, batch, sub)
        losses.append(float(loss_dict["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce the loss (compare step means to
    # tolerate adam transients)
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    # all ten component losses are present (ref function.py:363-369)
    for k in [
        "loss_joint", "loss_rot", "loss_uv", "loss_depth", "loss_trans",
        "loss_error2d", "loss_error3d", "loss_error2d_int",
        "loss_error3d_int", "loss_error3d_align",
    ]:
        assert k in loss_dict


def test_full_eval_metrics(fixture_batch):
    cfg = small_cfg()
    mesh = make_mesh()
    model = build_full_net(_model_cfg())
    robot = load_robot("dofbot")
    tx = make_optimizer(cfg)
    B, S = 8, 64
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((B, S, S, 3)), jnp.zeros((B, S, S, 3)), jnp.ones((B,)),
         jnp.asarray(fixture_batch["other_K"])),
    )
    evaluate = make_full_net_eval(cfg, model, robot, use_pnp=False)
    loss_dict, m_fk, m_int, out = evaluate(state, shard_batch(mesh, fixture_batch))
    assert m_fk["image_dis3d"].shape == (8,)
    assert m_fk["dis3d_per_kp"].shape == (8,)  # dofbot nkpt=8
    assert m_fk["l1_joint_per_joint"].shape == (6,)
    assert np.isfinite(float(loss_dict["rotation_diff"]))


def test_depthnet_step(fixture_batch):
    cfg = small_cfg()
    mesh = make_mesh()
    model = RootNet(backbone="resnet18")
    tx = make_optimizer(cfg)
    B, S = 8, 64
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((B, S, S, 3)), jnp.ones((B,))),
    )
    step = make_depthnet_step(cfg, model, tx)
    batch = shard_batch(mesh, fixture_batch)
    losses = []
    for i in range(20):
        state, loss_dict = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss_dict["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


@pytest.mark.slow
def test_depthnet_xy_branch_trains(fixture_batch):
    """use_rootnet_xy_branch: the xy soft-argmax head must receive
    gradient (ref train_depthnet.py:293-299; VERDICT r1 #7)."""
    cfg = small_cfg()
    cfg.use_rootnet_xy_branch = True
    mesh = make_mesh()
    model = RootNet(backbone="resnet18", pred_xy=True)
    tx = make_optimizer(cfg)
    B, S = 8, 64
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((B, S, S, 3)), jnp.ones((B,))),
    )
    step = make_depthnet_step(cfg, model, tx)
    batch = shard_batch(mesh, fixture_batch)
    xy_losses = []
    for i in range(20):
        state, loss_dict = step(state, batch, jax.random.PRNGKey(i))
        xy_losses.append(float(loss_dict["loss_xy"]))
    assert np.isfinite(xy_losses).all()
    assert np.mean(xy_losses[-4:]) < np.mean(xy_losses[:4]), xy_losses


def test_lr_schedules():
    cfg = make_default_config()
    cfg.use_schedule = True
    cfg.schedule_type = "exponential"
    cfg.n_epochs_warmup = 2
    cfg.start_decay = 5
    cfg.end_decay = 10
    cfg.exponent = 0.9
    assert lr_factor(cfg, 0) == pytest.approx(0.5)
    assert lr_factor(cfg, 3) == 1.0
    assert lr_factor(cfg, 6) == pytest.approx(0.9)
    assert lr_factor(cfg, 11) == pytest.approx(0.9**5)
    cfg.schedule_type = "everyXepoch"
    cfg.step = 5
    cfg.step_decay = 0.1
    assert lr_factor(cfg, 4) == 1.0
    assert lr_factor(cfg, 5) == pytest.approx(0.1)


def test_set_learning_rate():
    cfg = small_cfg()
    model = RootNet(backbone="resnet18")
    tx = make_optimizer(cfg)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((2, 64, 64, 3)), jnp.ones((2,))),
    )
    state = set_learning_rate(state, 5e-4)
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-4)


def test_warm_start_seeds_params_fresh_optimizer(tmp_path):
    """cfg.warm_start loads a previous run's slim best checkpoint into a
    NEW experiment's initial state (params + batch_stats) while keeping a
    fresh optimizer and step=0 (trainer.py init_state warm-start hook)."""
    from hrpe_tpu.engine.checkpoints import CheckpointManager
    from hrpe_tpu.engine.trainer import Trainer

    cfg = small_cfg()
    cfg.use_rootnet_with_reg_int_shared_backbone = True
    cfg.train_ds_names = "dofbot_synth_train_dr"
    tr = Trainer(cfg, "full")
    donor = tr.init_state()
    # perturb so the donor is distinguishable from a fresh init
    donor = donor.replace(
        params=jax.tree.map(lambda p: p + 1.0, donor.params),
        step=jnp.asarray(777, jnp.int32),
    )
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save_if_best("dr", donor, epoch=5, score=1.0, prev_best=-np.inf)

    cfg2 = small_cfg()
    cfg2.use_rootnet_with_reg_int_shared_backbone = True
    cfg2.train_ds_names = "dofbot_synth_train_dr"
    cfg2.warm_start = str(tmp_path / "ckpt" / "best_dr")
    state = Trainer(cfg2, "full").init_state()

    got = jax.tree.leaves(state.params)[0]
    want = jax.tree.leaves(jax.device_get(donor.params))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    assert int(state.step) == 0  # fresh epoch counter, fresh optimizer
