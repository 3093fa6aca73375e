"""Self-supervised sim2real fine-tuning (mask-consistency training).

Re-design of scripts/train_sim2real.py: fine-tune the synth-pretrained
full network on real images without labels, supervising the predicted
(pose, rot, trans) through a differentiable silhouette render compared to
CtRNet foreground masks. Differences from the reference's mechanics, same
math:

  * the per-sample pytorch3d render loop rebuilt every batch
    (train_sim2real.py:406-416, mesh preload each time) becomes ONE
    vmapped soft-silhouette render inside the jitted loss;
  * roboticstoolbox fkine mesh posing is replaced by the framework FK;
  * BN is frozen by evaluating with running stats (ref freezes BN modules,
    train_sim2real.py:144-148; dropout is also off here);
  * losses: w_mask * MSE(render, seg) + w_iou * (1 - softIoU)
    + w_scale * |log(area_pred / area_seg)| + w_align * ||kp_fk - kp_int||
    (ref train_sim2real.py:437-473).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ctrnet import SegMaskInference, build_seg_net
from ..render import RobotMesh, default_link_meshes, soft_silhouette
from .losses import full_net_losses, k_values
from .train_state import TrainState, assemble_gt


RENDER_SCALE = 0.5  # ref urdf_robot.py:225 set_robot_renderer(scale=0.5)


def make_sim2real_step(cfg, model, tx, robot, robot_mesh: RobotMesh, render_hw):
    """Build the jitted sim2real train step."""
    import optax

    ref_id = cfg.reference_keypoint_id

    def loss_fn(params, batch_stats, batch, seg_masks, rng):
        gt_pose, _, gt_rot, k_vals = assemble_gt(cfg, batch, robot, use_pnp=True)
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(
            variables,
            batch["other_images"].astype(jnp.float32) / 255.0,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            batch["other_K"],
            train=False,  # frozen BN / no dropout (ref :144-148)
        )
        # supervised-style losses: computed for logging only (ref :317-400)
        sup_loss, sup_dict = full_net_losses(cfg, out, batch, gt_rot, gt_pose)

        # silhouette self-supervision
        # base->camera pose implied by the predicted root pose; joints are
        # detached in the re-rooting (ref urdf_robot.py:304)
        q_d = jax.lax.stop_gradient(out["pose"])
        base2cam = robot.root_to_base_pose(q_d, out["rot"], out["trans"], ref_id)
        verts = robot_mesh.posed_verts(out["pose"], base2cam)  # (B, V, 3)
        K_half = batch["K_original"] * RENDER_SCALE
        K_half = K_half.at[:, 2, 2].set(1.0)
        renders = jax.vmap(
            lambda v, Kc: soft_silhouette(
                v, robot_mesh.faces, Kc, render_hw, sigma=1e-4
            )
        )(verts, K_half)

        inter = jnp.sum(renders * seg_masks, axis=(1, 2))
        union = jnp.sum(renders + seg_masks - renders * seg_masks, axis=(1, 2))
        loss_iou = jnp.mean(1.0 - inter / jnp.maximum(union, 1.0))
        loss_mask = jnp.mean((renders - seg_masks) ** 2)
        area_p = jnp.sum(renders, axis=(1, 2))
        area_s = jnp.sum(seg_masks, axis=(1, 2))
        loss_scale = jnp.mean(
            jnp.abs(jnp.log(jnp.maximum(area_p, 1.0) / jnp.maximum(area_s, 1.0)))
        )
        loss_align = jnp.mean(
            jnp.linalg.norm(out["xyz_fk"] - out["xyz_int"], axis=-1)
        )

        total = (
            cfg.mask_loss_weight * loss_mask
            + cfg.iou_loss_weight * loss_iou
            + cfg.scale_loss_weight * loss_scale
            + cfg.align_3d_loss_weight * loss_align
        )
        loss_dict = {
            "loss_mask": loss_mask,
            "loss_iou": loss_iou,
            "loss_scale": loss_scale,
            "loss_align": loss_align,
            "sup_loss_logged": sup_loss,
            **{f"sup_{k}": v for k, v in sup_dict.items()},
        }
        return total, loss_dict

    @jax.jit
    def step(state: TrainState, batch, seg_masks, rng):
        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, seg_masks, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        loss_dict["loss"] = total
        return (
            state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
            loss_dict,
        )

    return step


class Sim2RealTrainer:
    """Host loop for the sim2real pipeline (ref train_sim2real.py:30-731)."""

    def __init__(self, cfg, seg=None, mesh_files: dict | None = None):
        from ..kinematics import load_robot
        from ..models import build_full_net
        from .schedules import make_optimizer

        self.cfg = cfg
        self.robot = load_robot(cfg.urdf_robot_name)
        self.model = build_full_net(cfg.full_net_config())
        self.tx = make_optimizer(cfg)
        link_meshes = mesh_files or default_link_meshes(self.robot)
        self.robot_mesh = RobotMesh(self.robot, link_meshes)
        # frozen segmentation net (pretrained import via checkpoint_io when
        # the reference .pth weights are available; random otherwise)
        if seg is None:
            seg_model, seg_vars = build_seg_net(
                num_keypoints=self.robot.num_keypoints
            )
            seg = SegMaskInference(seg_model, seg_vars, scale=RENDER_SCALE)
        self.seg = seg

    def fit(self, n_epochs=None):
        from ..data.dream import DreamDataset
        from ..data.loader import DataLoader
        from ..parallel import make_mesh, shard_batch
        from .checkpoints import CheckpointManager
        from .logging import AverageMeter, create_logger
        from .schedules import lr_factor
        from .train_state import create_train_state, set_learning_rate
        from .trainer import Trainer, _pad_batch

        cfg = self.cfg
        mesh = make_mesh()
        save_dir, ckpt_dir, log_dir, writer = create_logger(
            cfg.exp_name, cfg.config_path if os.path.exists(cfg.config_path) else None
        )
        ckpt = CheckpointManager(ckpt_dir)

        ds = DreamDataset(
            cfg.train_ds_names, color_jitter=False, rgb_augmentation=False,
            occlusion_augmentation=False, robot=cfg.urdf_robot_name,
            include_original=True,
        )
        loader = DataLoader(ds, cfg.batch_size,
                            num_workers=cfg.n_dataloader_workers)
        H0, W0 = 480, 640
        render_hw = (int(H0 * RENDER_SCALE), int(W0 * RENDER_SCALE))
        step = make_sim2real_step(
            cfg, self.model, self.tx, self.robot, self.robot_mesh, render_hw
        )

        S = int(cfg.other_image_size)
        B = cfg.batch_size
        K0 = jnp.tile(jnp.eye(3), (B, 1, 1)).at[:, 0, 0].set(320.0).at[:, 1, 1].set(320.0)
        state = create_train_state(
            self.model, self.tx, jax.random.PRNGKey(0),
            (jnp.zeros((B, S, S, 3)), jnp.zeros((B, S, S, 3)), jnp.ones((B,)), K0),
        )
        # load synth-pretrained weights (ref train_sim2real.py:85-99):
        # an orbax dir (ours), a torch .pk (reference zoo), or absent (warn)
        if cfg.pretrained_weight_on_synth:
            path = cfg.pretrained_weight_on_synth
            if not os.path.exists(path):
                path = os.path.join("experiments", path)
            if os.path.isdir(path):
                import orbax.checkpoint as ocp

                state = ocp.StandardCheckpointer().restore(
                    os.path.abspath(path), target=jax.device_get(state)
                )
                print(f"loaded synth-pretrained weights from {path}")
            elif os.path.isfile(path):
                from ..utils.checkpoint_io import (
                    import_state_dict,
                    load_torch_state_dict,
                    translate_fullnet_key,
                )

                sd = load_torch_state_dict(path)
                variables, report = import_state_dict(
                    sd,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    lambda k: translate_fullnet_key(
                        k, cfg.backbone_name.startswith("resnet")
                    ),
                )
                state = state.replace(
                    params=variables["params"],
                    batch_stats=variables["batch_stats"],
                )
                print(
                    f"imported {report['loaded']} tensors from {path} "
                    f"(skipped {len(report['skipped'])})"
                )
            else:
                print(f"WARNING: pretrained weights not found at {path}")

        # simple eval reuse: validate on the same real set via full pipeline
        eval_trainer = Trainer.__new__(Trainer)
        eval_trainer.cfg = cfg
        eval_trainer.pipeline = "full"
        eval_trainer.mesh = mesh
        eval_trainer.robot = self.robot
        eval_trainer.model = self.model
        from .train_state import make_full_net_eval

        eval_trainer.eval_fn = make_full_net_eval(cfg, self.model, self.robot, True)

        rng = jax.random.PRNGKey(7)
        best = -np.inf
        n_epochs = n_epochs or cfg.n_epochs
        for epoch in range(n_epochs):
            state = set_learning_rate(state, cfg.lr * lr_factor(cfg, epoch))
            meter = AverageMeter()
            for batch in loader:
                batch, n_real = _pad_batch(batch, cfg.batch_size)
                images_orig = batch.pop("images_original")
                seg_masks = self.seg(jnp.asarray(images_orig, jnp.float32) / 255.0)
                batch = shard_batch(mesh, batch)
                rng, sub = jax.random.split(rng)
                state, loss_dict = step(state, batch, seg_masks, sub)
                meter.add(float(loss_dict["loss"]))
            writer.add_scalar("Train/loss_sim2real", meter.mean, epoch)
            print(f"sim2real epoch {epoch}: loss {meter.mean:.4f}")
            score, summary = eval_trainer.validate(state, loader, "real", epoch, writer)
            best = ckpt.save_if_best("real", state, epoch, score, best)
        return state
