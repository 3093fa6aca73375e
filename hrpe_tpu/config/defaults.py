"""Typed configuration tree + YAML overlay.

The reference uses an EasyDict of ~120 untyped defaults with ad-hoc
per-key coercion and *silently drops* unknown YAML keys
(lib/core/config.py:8-165). Here the config is one typed dataclass; YAML
overlay coerces by declared type and unknown keys raise (strict mode) or
warn — the silent-drop footgun is gone, while the YAML file layout and all
field names stay identical so the reference's configs/{robot}/*.yaml files
load unchanged.
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Any, List, Optional

import yaml


@dataclasses.dataclass
class Config:
    # basic experiment info
    exp_name: str = "default"
    config_path: str = "default"

    # training
    no_cuda: bool = False
    device_id: Any = 0
    batch_size: int = 64
    epoch_size: int = 104950
    n_epochs: int = 700
    n_dataloader_workers: int = 8
    clip_gradient: float = 10.0
    # cadence of the unconditional 'latest' resume checkpoint (epochs)
    latest_ckpt_every: int = 10
    # validate every N epochs (1 = reference behavior). Validation over the
    # tunnel costs real wall-clock; raising this trades best-checkpoint
    # granularity for training throughput.
    val_every: int = 1
    # sim2real: save the epoch's worst-IoU render-vs-seg overlay PNG
    # (ref train_sim2real.py:587-594)
    save_worst_vis: bool = True

    # data
    urdf_robot_name: str = "panda"
    train_ds_names: str = "dream/synthetic/panda_synth_train_dr"
    val_ds_names: Optional[str] = None
    image_size: float = 256.0

    # augmentation
    jitter: bool = True
    other_aug: bool = True
    occlusion: bool = True
    occlu_p: float = 0.5
    padding: bool = False
    fix_truncation: bool = False
    truncation_padding: List[int] = dataclasses.field(
        default_factory=lambda: [120, 120, 120, 120]
    )
    rootnet_flip: bool = False
    rootnet_rotate: bool = False  # ref dream.py:64 `rotate` (call site disabled there)
    blur_augmentation: bool = False
    grayscale_augmentation: bool = False

    # pipeline selection
    use_rootnet: bool = False
    use_rootnet_with_reg_int_shared_backbone: bool = False
    use_sim2real: bool = False
    use_sim2real_real: bool = False
    pretrained_rootnet: Optional[str] = None
    pretrained_weight_on_synth: Optional[str] = None
    use_view: bool = False
    known_joint: bool = False

    # optimizer / schedule
    lr: float = 1e-4
    weight_decay: float = 0.0
    use_schedule: bool = False
    schedule_type: str = ""
    n_epochs_warmup: int = 0
    start_decay: int = 100
    end_decay: int = 200
    final_decay: float = 0.01
    exponent: float = 1.0
    step_decay: float = 0.1
    step: int = 5

    # model
    backbone_name: str = "resnet50"
    rootnet_backbone_name: str = "hrnet32"
    rootnet_image_size: float = 256.0
    other_image_size: float = 256.0
    n_iter: int = 4
    p_dropout: float = 0.5
    use_rpmg: bool = False
    reg_joint_map: bool = False
    joint_conv_dim: List[int] = dataclasses.field(default_factory=list)
    rotation_dim: int = 6
    direct_reg_rot: bool = False
    rot_iterative_matmul: bool = False
    fix_root: bool = True
    reg_from_bb_out: bool = False
    depth_from_bb_out: bool = False
    bbox_3d_shape: List[int] = dataclasses.field(
        default_factory=lambda: [1300, 1300, 1300]
    )
    reference_keypoint_id: int = 3
    resample: bool = False
    use_origin_bbox: bool = False
    use_extended_bbox: bool = True
    extend_ratio: List[float] = dataclasses.field(
        default_factory=lambda: [0.2, 0.13]
    )
    use_offset: bool = False
    use_rootnet_xy_branch: bool = False
    add_fc: bool = False
    multi_kp: bool = False
    kps_need_depth: Optional[List[int]] = None

    # losses
    pose_loss_func: str = "mse"
    rot_loss_func: str = "mse"
    trans_loss_func: str = "l2norm"
    uv_loss_func: str = "l2norm"
    depth_loss_func: str = "l1"
    kp3d_loss_func: str = "l2norm"
    kp2d_loss_func: str = "l2norm"
    kp3d_int_loss_func: str = "l2norm"
    kp2d_int_loss_func: str = "l2norm"
    align_3d_loss_func: str = "l2norm"
    xy_loss_func: str = "l1"
    pose_loss_weight: float = 0.0
    rot_loss_weight: float = 0.0
    trans_loss_weight: float = 0.0
    uv_loss_weight: float = 0.0
    depth_loss_weight: float = 0.0
    kp2d_loss_weight: float = 0.0
    kp3d_loss_weight: float = 0.0
    kp2d_int_loss_weight: float = 0.0
    kp3d_int_loss_weight: float = 0.0
    align_3d_loss_weight: float = 0.0
    rootnet_depth_loss_weight: float = 1.0
    joint_individual_weights: Optional[List[float]] = None
    use_joint_valid_mask: bool = False
    fix_mask: bool = False

    # sim2real
    mask_loss_func: str = "mse_mean"
    mask_loss_weight: float = 0.0
    scale_loss_weight: float = 0.0
    iou_loss_weight: float = 0.0

    # resume
    resume_run: bool = False
    resume_experiment_name: str = "resume_name"
    # warm start: orbax checkpoint dir (slim or full layout) whose
    # params/batch_stats seed the run — cross-experiment fine-tuning
    # (e.g. continue a converged run on a larger regenerated dataset).
    # Unlike resume_run this starts at epoch 0 with a fresh optimizer.
    warm_start: Optional[str] = None
    distributed: bool = False

    # TPU-specific additions (absent in reference)
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype
    data_dir: str = "data"  # dataset root (ref lib/config.py LOCAL_DATA_DIR)

    def full_net_config(self):
        from ..models.full_net import FullNetConfig

        return FullNetConfig(
            robot_type=self.urdf_robot_name,
            backbone_name=self.backbone_name,
            rootnet_backbone_name=self.rootnet_backbone_name,
            image_size=int(self.other_image_size),
            n_iter=self.n_iter,
            p_dropout=self.p_dropout,
            rotation_dim=self.rotation_dim,
            direct_reg_rot=self.direct_reg_rot,
            rot_iterative_matmul=self.rot_iterative_matmul,
            reg_joint_map=self.reg_joint_map,
            joint_conv_dim=tuple(self.joint_conv_dim) or (256, 256, 256),
            fix_root=self.fix_root,
            reference_keypoint_id=self.reference_keypoint_id,
            bbox_depth_mm=float(self.bbox_3d_shape[2]),
            multi_kp=self.multi_kp,
            kps_need_depth=tuple(self.kps_need_depth) if self.kps_need_depth else None,
            add_fc=self.add_fc,
        )


_FIELDS = {f.name: f for f in dataclasses.fields(Config)}

_FLOAT_KEYS = {"lr", "exponent"}
_NONE_STRINGS = {"None", "none", "null", ""}


def make_default_config() -> Config:
    return Config()


def _coerce(key: str, value):
    f = _FIELDS[key]
    if value is None:
        return None
    if isinstance(value, str) and value in _NONE_STRINGS and (
        "Optional" in str(f.type) or key.startswith("pretrained")
    ):
        return None
    if key in _FLOAT_KEYS or key.endswith("loss_weight"):
        return float(value)
    if f.type == "float" and isinstance(value, (int, str)):
        return float(value)
    if f.type == "int" and isinstance(value, (float, str)):
        return int(float(value))
    return value


def load_config(path: str, strict: bool = False) -> Config:
    """Load defaults + YAML overlay (reference make_cfg, config.py:138-165).

    Unlike the reference, unknown keys are surfaced: raise when strict,
    warn otherwise (the reference silently ignores them, config.py:147 —
    several of its own YAML keys are in fact dropped).
    """
    cfg = make_default_config()
    cfg.config_path = path
    with open(path, encoding="utf-8") as f:
        overlay = yaml.safe_load(f.read()) or {}
    for k, v in overlay.items():
        if k in _FIELDS:
            setattr(cfg, k, _coerce(k, v))
        else:
            msg = f"unknown config key {k!r} in {path}"
            if strict:
                raise KeyError(msg)
            warnings.warn(msg)
    # path resolution like the reference (train_ds_names relative to data/)
    if not os.path.isabs(cfg.train_ds_names) and "move" not in cfg.train_ds_names:
        cfg.train_ds_names = os.path.abspath(
            os.path.join(cfg.data_dir, cfg.train_ds_names)
        )
    return cfg
