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
        iou_per_sample = inter / jnp.maximum(union, 1.0)
        loss_iou = jnp.mean(1.0 - iou_per_sample)
        # mask matching loss: MSE / BCE / scaled-sum-MSE, selected like
        # the reference (train_sim2real.py:436-443)
        func = getattr(cfg, "mask_loss_func", "mse_mean")
        if func == "mse_mean":
            loss_mask = jnp.mean((renders - seg_masks) ** 2)
        elif func == "bce":
            r = jnp.clip(renders, 1e-6, 1.0 - 1e-6)
            loss_mask = -jnp.mean(
                seg_masks * jnp.log(r) + (1.0 - seg_masks) * jnp.log(1.0 - r)
            )
        elif func == "mse_sum":
            loss_mask = 0.001 * jnp.mean(
                jnp.sum((renders - seg_masks) ** 2, axis=(1, 2))
            )
        else:
            raise NotImplementedError(f"mask_loss_func={func}")
        area_p = jnp.sum(renders, axis=(1, 2))
        area_s = jnp.sum(seg_masks, axis=(1, 2))
        loss_scale = jnp.mean(
            jnp.abs(jnp.log(jnp.maximum(area_p, 1.0) / jnp.maximum(area_s, 1.0)))
        )
        # safe_norm: xyz_fk[:, ref] == xyz_int[:, ref] by construction, and
        # jnp.linalg.norm's gradient at exactly 0 is NaN (see losses.safe_norm)
        from .losses import safe_norm

        loss_align = jnp.mean(safe_norm(out["xyz_fk"] - out["xyz_int"], axis=-1))

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
            # per-sample IoU for worst-case tracking (ref :587-594)
            "iou_per_sample": iou_per_sample,
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


def make_render_fn(cfg, model, robot, robot_mesh, render_hw):
    """Jitted (variables, batch) -> per-sample silhouette renders (B,H,W).

    Same prediction->render path as the training loss; used for the
    worst-IoU visual dump (ref train_sim2real.py:587-594)."""
    ref_id = cfg.reference_keypoint_id

    @jax.jit
    def render(variables, batch):
        _, _, _, k_vals = assemble_gt(cfg, batch, robot, use_pnp=True)
        out = model.apply(
            variables,
            batch["other_images"].astype(jnp.float32) / 255.0,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            batch["other_K"],
            train=False,
        )
        q_d = jax.lax.stop_gradient(out["pose"])
        base2cam = robot.root_to_base_pose(q_d, out["rot"], out["trans"], ref_id)
        verts = robot_mesh.posed_verts(out["pose"], base2cam)
        K_half = batch["K_original"] * RENDER_SCALE
        K_half = K_half.at[:, 2, 2].set(1.0)
        return jax.vmap(
            lambda v, Kc: soft_silhouette(
                v, robot_mesh.faces, Kc, render_hw, sigma=1e-4
            )
        )(verts, K_half)

    return render


def dump_worst_overlay(save_dir, epoch, image_rgb, seg_mask, render_mask, iou):
    """Write the worst-IoU sample's render-vs-seg overlay PNG.

    Red = CtRNet seg mask, green = silhouette render, gray = image —
    the visual form of ref train_sim2real.py:587-594's worst-case saves.
    """
    from PIL import Image

    H, W = seg_mask.shape
    img = Image.fromarray(image_rgb.astype(np.uint8)).resize((W, H))
    base = np.asarray(img, np.float32)
    gray = base.mean(-1, keepdims=True) * 0.5
    overlay = np.repeat(gray, 3, axis=-1)
    overlay[..., 0] += 127.0 * np.asarray(seg_mask, np.float32)
    overlay[..., 1] += 127.0 * np.clip(np.asarray(render_mask, np.float32), 0, 1)
    out_dir = os.path.join(save_dir, "worst_vis")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"epoch{epoch:04d}_iou{iou:.3f}.png")
    Image.fromarray(np.clip(overlay, 0, 255).astype(np.uint8)).save(path)
    return path


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
        # frozen segmentation net: import the reference's per-camera .pth
        # (ref mask_inference.py:35-44) when it is on disk; otherwise warn
        # loudly — random seg weights supervise against noise masks.
        if seg is None:
            from ..models.ctrnet import seg_checkpoint_path

            pth, code = seg_checkpoint_path(cfg.train_ds_names)
            if not os.path.exists(pth):
                import warnings

                warnings.warn(
                    f"seg-net checkpoint {pth} (camera '{code}') not found; "
                    "sim2real mask supervision will use RANDOM seg weights"
                )
                pth = None
            seg_model, seg_vars = build_seg_net(
                num_keypoints=self.robot.num_keypoints, checkpoint_path=pth
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

        # dataset names resolve under cfg.data_dir like the supervised
        # pipelines (trainer.get_dataloaders); absolute/explicit paths
        # (tests, fixtures) pass through untouched
        ds_path = cfg.train_ds_names
        if not os.path.exists(ds_path):
            ds_path = os.path.join(cfg.data_dir, ds_path)
        ds = DreamDataset(
            ds_path, color_jitter=False, rgb_augmentation=False,
            occlusion_augmentation=False, robot=cfg.urdf_robot_name,
            include_original=True,
        )

        # --- eval sets (ref train_sim2real.py:66-75, 701-728): evaluate
        # every real test set that is on disk; the checkpoint criterion is
        # the one matching the training camera. When none of the DREAM
        # real sets exist (fixture/smoke runs), fall back to a held-out
        # 10% slice of the training set: train on the first 90%, validate
        # on the last 10% — never select checkpoints on training data.
        from ..models.ctrnet import seg_checkpoint_path
        from ..data.loader import ListSampler

        _, code_name = seg_checkpoint_path(cfg.train_ds_names)
        real_sets = {
            "azure": "dream/real/panda-3cam_azure",
            "kinect": "dream/real/panda-3cam_kinect",
            "realsense": "dream/real/panda-3cam_realsense",
            "orb": "dream/real/panda-orb",
        }
        eval_loaders = {}
        for short, rel in real_sets.items():
            path = rel if os.path.isabs(rel) else os.path.join(cfg.data_dir, rel)
            if not os.path.isdir(path):
                continue
            eds = DreamDataset(
                path, color_jitter=False, rgb_augmentation=False,
                occlusion_augmentation=False, robot=cfg.urdf_robot_name,
            )
            if len(eds) == 0:
                continue
            eval_loaders[short] = DataLoader(
                eds, cfg.batch_size, shuffle=False,
                num_workers=cfg.n_dataloader_workers,
            )
        if eval_loaders:
            ckpt_tag = code_name if code_name in eval_loaders else next(iter(eval_loaders))
            train_sampler = None
        else:
            n = len(ds)
            n_eval = max(1, n // 10)
            train_sampler = ListSampler(list(range(n - n_eval)))
            eval_ds = DreamDataset(
                ds_path, color_jitter=False, rgb_augmentation=False,
                occlusion_augmentation=False, robot=cfg.urdf_robot_name,
            )
            eval_loaders["heldout"] = DataLoader(
                eval_ds, cfg.batch_size, sampler=ListSampler(list(range(n - n_eval, n))),
                shuffle=False, num_workers=cfg.n_dataloader_workers,
            )
            ckpt_tag = "heldout"

        loader = DataLoader(ds, cfg.batch_size, sampler=train_sampler,
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
                from .checkpoints import restore_state

                # handles both slim (params/batch_stats) best checkpoints
                # and legacy full-TrainState layouts (ADVICE r4)
                state = restore_state(path, state)
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
        # resume (ref train_sim2real.py:108-124): restore the best-on-real
        # checkpoint of this experiment and continue from its epoch
        start_epoch, best = 0, -np.inf
        if cfg.resume_run:
            state, start_epoch, best = ckpt.resume_tag(ckpt_tag, state)
            print(f"resumed sim2real from epoch {start_epoch} (best {best:.4f})")

        render_fn = make_render_fn(
            cfg, self.model, self.robot, self.robot_mesh, render_hw
        )

        n_epochs = n_epochs or cfg.n_epochs
        for epoch in range(start_epoch, n_epochs):
            state = set_learning_rate(state, cfg.lr * lr_factor(cfg, epoch))
            # loss accumulates ON DEVICE; a single fetch per epoch (the
            # reference-equivalent of trainer.py's every-100-step sync)
            loss_sum = jnp.float32(0.0)
            n_steps = 0
            worst_iou = jnp.float32(jnp.inf)
            worst = None  # (iou, batch payload, sample idx, seg row)
            for batch in loader:
                batch, n_real = _pad_batch(batch, cfg.batch_size)
                images_orig = batch.pop("images_original")
                if "mask_original" in batch:
                    # GT silhouette sidecars (generated pseudo-real sets):
                    # the frozen-seg stand-in — downscale to the render
                    # grid exactly like SegMaskInference's output scale
                    gt_m = jnp.asarray(batch.pop("mask_original"), jnp.float32)
                    seg_masks = jax.image.resize(
                        gt_m,
                        (gt_m.shape[0], *render_hw),
                        method="bilinear",
                    )
                else:
                    seg_masks = self.seg(
                        jnp.asarray(images_orig, jnp.float32) / 255.0
                    )
                batch = shard_batch(mesh, batch)
                rng, sub = jax.random.split(rng)
                state, loss_dict = step(state, batch, seg_masks, sub)
                loss_sum = loss_sum + loss_dict["loss"]
                worst_iou = jnp.minimum(
                    worst_iou, jnp.min(loss_dict["iou_per_sample"][:n_real])
                )
                if cfg.save_worst_vis:
                    # worst-sample payload for the epoch-end visual dump
                    ious = np.asarray(loss_dict["iou_per_sample"][:n_real])
                    i = int(ious.argmin())
                    if worst is None or ious[i] < worst[0]:
                        worst = (
                            float(ious[i]),
                            {k: np.asarray(v[i : i + 1]) for k, v in batch.items()},
                            np.asarray(images_orig[i]),
                            np.asarray(seg_masks[i]),
                        )
                n_steps += 1
            mean_loss = float(loss_sum) / max(n_steps, 1)
            writer.add_scalar("Train/loss_sim2real", mean_loss, epoch)
            # worst-case tracking (ref train_sim2real.py:587-594): the
            # epoch's minimum per-sample IoU flags degenerate renders
            writer.add_scalar("Train/worst_iou_sim2real", float(worst_iou), epoch)
            if cfg.save_worst_vis and worst is not None:
                iou_w, b1, img1, seg1 = worst
                # pad the single sample back to the compiled batch size
                bB = {
                    k: np.repeat(v, cfg.batch_size, axis=0)
                    for k, v in b1.items()
                }
                rmask = np.asarray(render_fn(state.variables, bB)[0])
                dump_worst_overlay(save_dir, epoch, img1, seg1, rmask, iou_w)
            print(
                f"sim2real epoch {epoch}: loss {mean_loss:.4f} "
                f"(worst IoU {float(worst_iou):.3f})"
            )
            for short, eloader in eval_loaders.items():
                score, summary = eval_trainer.validate(
                    state, eloader, short, epoch, writer
                )
                if short == ckpt_tag:
                    best = ckpt.save_if_best(ckpt_tag, state, epoch, score, best)
        return state
