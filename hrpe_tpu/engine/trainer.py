"""Unified training orchestration for the full-net and depthnet pipelines.

One engine replaces the reference's three near-duplicate loops
(scripts/train_full.py, train_depthnet.py; sim2real lives in
engine/sim2real.py): build dataloaders -> jitted sharded step ->
per-epoch validation with AUC summaries -> best-per-dataset checkpoints.
Mixed precision is bf16 compute (the TPU analogue of the reference's
Accelerate fp16, train_full.py:20-23); distribution is the data mesh
(parallel/mesh.py) instead of DDP/Accelerate wrappers.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dream import DreamDataset
from ..data.loader import DataLoader, PartialSampler
from ..kinematics import load_robot
from ..models import RootNet, build_full_net
from ..parallel import make_mesh, shard_batch
from .checkpoints import REAL_SETS, CheckpointManager
from .logging import AverageMeter, create_logger
from .metrics import summary_add_pck
from .schedules import lr_factor, make_optimizer
from .train_state import (
    create_train_state,
    make_depthnet_eval,
    make_depthnet_step,
    make_full_net_eval,
    make_full_net_step,
    set_learning_rate,
)

ADD_THRESHOLDS = [1, 5, 10, 20, 40, 60, 80, 100]
PCK_THRESHOLDS = [2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 17.5, 20.0]


def get_dataloaders(cfg) -> tuple:
    """Train + {dr, photo?, 4 real?} test loaders (ref utils.py:64-143)."""
    robot = cfg.urdf_robot_name
    train_name = cfg.train_ds_names
    hw = (int(cfg.rootnet_image_size), int(cfg.rootnet_image_size))
    ohw = (int(cfg.other_image_size), int(cfg.other_image_size))

    def make_ds(path, train, truncation=False):
        return DreamDataset(
            path,
            rootnet_resize_hw=hw,
            other_resize_hw=ohw,
            color_jitter=cfg.jitter if train else False,
            rgb_augmentation=cfg.other_aug if train else False,
            occlusion_augmentation=cfg.occlusion if train else False,
            occlu_p=cfg.occlu_p,
            flip=cfg.rootnet_flip if train else False,
            rotate=cfg.rootnet_rotate if train else False,
            blur_augmentation=cfg.blur_augmentation if train else False,
            grayscale_augmentation=cfg.grayscale_augmentation if train else False,
            padding=cfg.padding if train else False,
            process_truncation=truncation,
            robot=robot,
        )

    ds_train = make_ds(train_name, True)
    if getattr(cfg, "resample", False) and os.path.exists("unit_test/z_weights.npy"):
        # depth-weighted resampling (ref train_depthnet.py:89-92)
        from .loader import WeightedSampler

        w = np.load("unit_test/z_weights.npy")
        sampler = WeightedSampler(w[: len(ds_train)], cfg.epoch_size)
    else:
        sampler = PartialSampler(len(ds_train), cfg.epoch_size)
    train_loader = DataLoader(
        ds_train,
        cfg.batch_size,
        sampler=sampler,
        num_workers=cfg.n_dataloader_workers,
    )
    test_loaders = {}
    dr_name = train_name.replace("train_dr", "test_dr")
    if os.path.isdir(dr_name):
        test_loaders["dr"] = DataLoader(
            make_ds(dr_name, False), cfg.batch_size, shuffle=False,
            num_workers=cfg.n_dataloader_workers,
        )
    if robot not in ("baxter", "dofbot"):
        photo = train_name.replace("train_dr", "test_photo")
        if os.path.isdir(photo):
            test_loaders["photo"] = DataLoader(
                make_ds(photo, False), cfg.batch_size, shuffle=False,
                num_workers=cfg.n_dataloader_workers,
            )
    if robot == "panda":
        real_map = {
            "azure": "real/panda-3cam_azure",
            "kinect": "real/panda-3cam_kinect360",
            "realsense": "real/panda-3cam_realsense",
            "orb": "real/panda-orb",
        }
        for short, rel in real_map.items():
            path = train_name.replace("synthetic/panda_synth_train_dr", rel)
            if os.path.isdir(path):
                # real sets optionally fix frame truncation (ref utils.py:127)
                test_loaders[short] = DataLoader(
                    make_ds(path, False, truncation=cfg.fix_truncation),
                    cfg.batch_size, shuffle=False,
                    num_workers=cfg.n_dataloader_workers,
                )
    return train_loader, test_loaders


def _count_notfinite(opt_state) -> int:
    """Total updates skipped by optax.apply_if_finite (0 if absent)."""
    total = 0
    for leaf in jax.tree.leaves(
        opt_state, is_leaf=lambda x: hasattr(x, "total_notfinite")
    ):
        if hasattr(leaf, "total_notfinite"):
            total += int(leaf.total_notfinite)
    return total


def _pad_batch(batch: Dict[str, np.ndarray], multiple: int):
    """Pad the trailing partial batch to a fixed size (avoids recompiles);
    returns (padded_batch, real_count)."""
    n = batch["jointpose"].shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return batch, n
    pad = target - n

    def pad_arr(x):
        reps = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        return reps

    return {k: pad_arr(v) for k, v in batch.items()}, n


class Trainer:
    """Host-side loop. `pipeline` in {'full', 'depthnet'}."""

    def __init__(self, cfg, pipeline: str):
        self.cfg = cfg
        self.pipeline = pipeline
        self.mesh = make_mesh()
        self.robot = load_robot(cfg.urdf_robot_name)
        self.use_pnp = "synth" not in cfg.train_ds_names
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if pipeline == "full":
            self.model = build_full_net(cfg.full_net_config(), dtype=dtype)
        else:
            self.model = RootNet(
                backbone=cfg.backbone_name,
                pred_xy=cfg.use_rootnet_xy_branch,
                use_offset=cfg.use_offset,
                add_fc=cfg.add_fc,
                dtype=dtype,
            )
        self.tx = make_optimizer(cfg)
        if pipeline == "full":
            self.step_fn = make_full_net_step(cfg, self.model, self.tx, self.robot, self.use_pnp)
            self.eval_fn = make_full_net_eval(cfg, self.model, self.robot, self.use_pnp)
        else:
            self.step_fn = make_depthnet_step(cfg, self.model, self.tx)
            self.eval_fn = make_depthnet_eval(cfg, self.model)

    def init_state(self):
        cfg = self.cfg
        S = int(cfg.other_image_size)
        B = cfg.batch_size
        K = jnp.tile(jnp.eye(3), (B, 1, 1)).at[:, 0, 0].set(320.0).at[:, 1, 1].set(320.0)
        if self.pipeline == "full":
            inputs = (
                jnp.zeros((B, S, S, 3)), jnp.zeros((B, S, S, 3)),
                jnp.ones((B,)), K,
            )
        else:
            inputs = (jnp.zeros((B, S, S, 3)), jnp.ones((B,)))
        state = create_train_state(self.model, self.tx, jax.random.PRNGKey(0), inputs)

        # pretrained-rootnet chaining from OUR depthnet checkpoints (orbax
        # dir saved by the depthnet pipeline): backbone -> rootnet_backbone,
        # depth_head/depth_fc -> depth_layer — the native analogue of the
        # reference's .pk remap (full_net.py:487-500)
        if (
            self.pipeline == "full"
            and cfg.pretrained_rootnet
            and os.path.isdir(cfg.pretrained_rootnet)
        ):
            import orbax.checkpoint as ocp

            raw = ocp.StandardCheckpointer().restore(
                os.path.abspath(cfg.pretrained_rootnet)
            )
            params = dict(state.params)
            bstats = dict(state.batch_stats)
            n_loaded = 0
            for col, dst in (("params", params), ("batch_stats", bstats)):
                src = raw.get(col) or {}
                if "backbone" in src and "rootnet_backbone" in dst:
                    dst["rootnet_backbone"] = jax.tree.map(
                        jnp.asarray, src["backbone"]
                    )
                    n_loaded += len(jax.tree.leaves(src["backbone"]))
            dh = ((raw.get("params") or {}).get("depth_head") or {}).get("depth_fc")
            if (
                dh is not None
                and "depth_layer" in params
                and params["depth_layer"]["kernel"].shape == np.shape(dh["kernel"])
            ):
                params["depth_layer"] = jax.tree.map(jnp.asarray, dh)
                n_loaded += 2
            state = state.replace(params=params, batch_stats=bstats)
            print(
                f"loaded pretrained rootnet (orbax) {cfg.pretrained_rootnet}: "
                f"{n_loaded} tensors"
            )
        # pretrained-rootnet chaining (ref full_net.py:487-500: depthnet
        # .pk with 'backbone.' keys remapped into 'rootnet_backbone.')
        elif (
            self.pipeline == "full"
            and cfg.pretrained_rootnet
            and os.path.isfile(cfg.pretrained_rootnet)
        ):
            from ..utils.checkpoint_io import (
                import_state_dict,
                load_torch_state_dict,
                translate_fullnet_key,
            )

            sd = load_torch_state_dict(cfg.pretrained_rootnet)
            variables, report = import_state_dict(
                sd,
                {"params": state.params, "batch_stats": state.batch_stats},
                lambda k: translate_fullnet_key(
                    k, cfg.backbone_name.startswith("resnet")
                ),
                remap_prefix=("backbone.", "rootnet_backbone."),
            )
            state = state.replace(
                params=variables["params"], batch_stats=variables["batch_stats"]
            )
            print(
                f"loaded pretrained rootnet {cfg.pretrained_rootnet}: "
                f"{report['loaded']} tensors"
            )
        elif self.pipeline == "full" and cfg.pretrained_rootnet:
            print(
                f"pretrained rootnet not found at {cfg.pretrained_rootnet}; "
                "training depth head from scratch"
            )

        # cross-experiment warm start (cfg.warm_start): seed params +
        # batch_stats from a previous run's best checkpoint (slim or full
        # layout) but keep a FRESH optimizer and epoch counter — the
        # continue-on-more-data recipe. Applied last so it wins over the
        # pretrained-rootnet chaining above.
        if getattr(cfg, "warm_start", None):
            if os.path.isdir(cfg.warm_start):
                from .checkpoints import restore_state

                state = restore_state(cfg.warm_start, state)
                state = state.replace(step=jnp.zeros_like(state.step))
                print(f"warm start from {cfg.warm_start}")
            else:
                print(f"warm_start checkpoint not found: {cfg.warm_start}")
        return state

    # ------------------------------------------------------------------
    def validate(self, state, loader, dsname: str, epoch: int, writer):
        """Eval over one test set; returns AUC(ADD) for full pipeline or
        -depth_error for depthnet (ref function.py:377-464)."""
        t_val0 = time.time()
        t_data = t_eval = t_fetch = 0.0
        t_mark = time.time()
        alldis = defaultdict(list)
        alldis_int = defaultdict(list)
        meters = defaultdict(AverageMeter)
        per_kp = defaultdict(lambda: AverageMeter())
        for batch in loader:
            t_data += time.time() - t_mark
            t_mark = time.time()
            batch, n_real = _pad_batch(batch, loader.local_batch_size)
            batch = shard_batch(self.mesh, batch)
            if self.pipeline == "full":
                loss_dict, m_fk, m_int, _ = self.eval_fn(state, batch)
                t_eval += time.time() - t_mark
                t_mark = time.time()
                loss_dict, m_fk, m_int = jax.device_get((loss_dict, m_fk, m_int))
                t_fetch += time.time() - t_mark
                alldis["dis3d"].extend(m_fk["image_dis3d"][:n_real])
                alldis["dis2d"].extend(m_fk["image_dis2d"][:n_real])
                alldis["jointerror"].extend(m_fk["image_joint_err"][:n_real])
                alldis_int["dis3d"].extend(m_int["image_dis3d"][:n_real])
                alldis_int["dis2d"].extend(m_int["image_dis2d"][:n_real])
                for k, v in loss_dict.items():
                    meters[k].add(np.mean(v), n_real)
                for i, v in enumerate(m_fk["dis3d_per_kp"]):
                    per_kp[f"distance3D_keypoint_{i+1}"].add(v, n_real)
                for i, v in enumerate(m_fk["dis2d_per_kp"]):
                    per_kp[f"distance2D_keypoint_{i+1}"].add(v, n_real)
                for i, v in enumerate(m_fk["l1_joint_per_joint"]):
                    per_kp[f"l1error_joint_{i+1}"].add(v, n_real)
            else:
                loss_dict = jax.device_get(self.eval_fn(state, batch))
                alldis["deptherror"].extend(loss_dict.pop("depth_abs_err")[:n_real])
                for k, v in loss_dict.items():
                    meters[k].add(np.mean(v), n_real)
            t_mark = time.time()

        # multi-host: every process saw a disjoint slice of the set; gather
        # the per-image distance lists so AUC summaries are global (the
        # TPU analogue of dist.all_reduce'd validation stats,
        # ref train_depthnet.py:334-365)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            for d in (alldis, alldis_int):
                for k in list(d.keys()):
                    g = multihost_utils.process_allgather(
                        np.asarray(d[k]), tiled=True
                    )
                    d[k] = list(np.asarray(g))

        ds = "_" + dsname
        if self.pipeline == "full":
            summary = summary_add_pck(alldis["dis3d"], alldis["dis2d"])
            summary_int = summary_add_pck(alldis_int["dis3d"], alldis_int["dis2d"])
            if writer:
                for k, m in meters.items():
                    writer.add_scalar(f"Val/{k}{ds}", m.mean, epoch)
                writer.add_scalar(f"Val/AUC_ADD{ds}", summary["ADD/AUC"], epoch)
                writer.add_scalar(f"Val/AUC_PCK{ds}", summary["PCK/AUC"], epoch)
                writer.add_scalar(
                    f"Val/AUC_ADD_integral_xyz_metrics{ds}", summary_int["ADD/AUC"], epoch
                )
                writer.add_scalar(
                    f"Val/AUC_PCK_integral_xyz_metrics{ds}", summary_int["PCK/AUC"], epoch
                )
                writer.add_scalar(
                    f"Val/mean_joint_error{ds}",
                    float(np.mean(alldis["jointerror"]) / np.pi * 180.0), epoch,
                )
                for t in ADD_THRESHOLDS:
                    writer.add_scalar(f"Val/ADD_{t}_mm{ds}", summary[f"ADD_{t}_mm"], epoch)
                for t in PCK_THRESHOLDS:
                    writer.add_scalar(f"Val/PCK_{t}_pixel{ds}", summary[f"PCK_{t}_pixel"], epoch)
                for k, m in per_kp.items():
                    writer.add_scalar(f"Val/{k}{ds}", m.mean, epoch)
            print(
                f"  [val timing] total {time.time()-t_val0:.1f}s: "
                f"data {t_data:.1f}s eval {t_eval:.1f}s fetch {t_fetch:.1f}s"
            )
            return summary["ADD/AUC"], summary
        else:
            mean_err = float(np.mean(alldis["deptherror"]))
            if writer:
                writer.add_scalar(f"Val/root_depth_error{ds}", mean_err, epoch)
                for k, m in meters.items():
                    writer.add_scalar(f"Val/{k}{ds}", m.mean, epoch)
            return -mean_err, {"root_depth_l1": mean_err}

    # ------------------------------------------------------------------
    def fit(self, n_epochs: int | None = None):
        cfg = self.cfg
        save_dir, ckpt_dir, log_dir, writer = create_logger(
            cfg.exp_name, cfg.config_path if os.path.exists(cfg.config_path) else None
        )
        ckpt = CheckpointManager(ckpt_dir)
        train_loader, test_loaders = get_dataloaders(cfg)
        state = self.init_state()
        start_epoch, bests = 0, {"dr": -np.inf, **{k: -np.inf for k in REAL_SETS}}
        if cfg.resume_run:
            state, start_epoch, bests = ckpt.resume(state)

        rng = jax.random.PRNGKey(1234)
        n_epochs = n_epochs or cfg.n_epochs
        for epoch in range(start_epoch, n_epochs):
            state = set_learning_rate(state, cfg.lr * lr_factor(cfg, epoch))
            t0 = time.time()
            meter = AverageMeter()
            for bi, batch in enumerate(train_loader):
                batch, n_real = _pad_batch(batch, train_loader.local_batch_size)
                batch = shard_batch(self.mesh, batch)
                rng, sub = jax.random.split(rng)
                state, loss_dict = self.step_fn(state, batch, sub)
                if bi % 100 == 0:
                    loss = float(loss_dict["loss"])
                    meter.add(loss)
                    writer.add_scalar(
                        "Train/loss", loss, epoch * len(train_loader) + bi
                    )
            dt = time.time() - t0
            n_bad = _count_notfinite(state.opt_state)
            bad_note = f", skipped-nonfinite {n_bad}" if n_bad else ""
            print(f"epoch {epoch}: train loss {meter.mean:.4f} ({dt:.1f}s{bad_note})")
            writer.add_scalar("Train/skipped_nonfinite_updates", n_bad, epoch)

            auc_scores = {}
            # validation cadence (cfg.val_every; reference validates every
            # epoch — function.py:377 — but over the hosted tunnel a full
            # validation costs multiples of the train phase)
            if (epoch + 1) % max(1, cfg.val_every) == 0 or epoch == n_epochs - 1:
                for dsname, loader in test_loaders.items():
                    score, summary = self.validate(state, loader, dsname, epoch, writer)
                    auc_scores[dsname] = score
                    print(f"  val[{dsname}]: {summary}")

            # best-per-dataset checkpointing (ref utils.py:223-268)
            if "dr" in auc_scores:
                bests["dr"] = ckpt.save_if_best(
                    "dr", state, epoch, auc_scores["dr"], bests["dr"]
                )
            for name in REAL_SETS:
                if name in auc_scores:
                    bests[name] = ckpt.save_if_best(
                        name, state, epoch, auc_scores[name], bests[name]
                    )
            # weighted 'allreal' composite for the depthnet pipeline
            # (ref train_depthnet.py:455-527: orb/realsense x1.0, others x0.4)
            real_w = {"orb": 1.0, "realsense": 1.0, "azure": 0.4, "kinect": 0.4}
            if self.pipeline == "depthnet" and any(
                n in auc_scores for n in real_w
            ):
                composite = sum(
                    real_w[n] * auc_scores[n] for n in real_w if n in auc_scores
                )
                bests["allreal"] = ckpt.save_if_best(
                    "allreal", state, epoch, composite,
                    bests.get("allreal", -np.inf),
                )
            # last-state checkpoint for preemption-safe resume; periodic —
            # a full-state orbax write every epoch would dominate the
            # wall-clock of short epochs on tiny datasets
            if (epoch + 1) % cfg.latest_ckpt_every == 0 or epoch == n_epochs - 1:
                ckpt.save_latest(state, epoch, bests)
        return state
