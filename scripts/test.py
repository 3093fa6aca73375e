#!/usr/bin/env python
"""Evaluation CLI.

Same interface as the reference (scripts/test.py):
    python scripts/test.py -e experiments/panda_full -d panda_synth_test_dr
Rebuilds the config from the experiment's saved config.yaml, loads the
best checkpoint, evaluates the requested dataset and writes
result/summary.txt with AUC(ADD)/AUC(PCK), per-threshold ADD/PCK tables,
per-joint L1 errors and inference runtimes/FPS (ref test.py:242-272).
"""

import argparse
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser("Testing")
    p.add_argument("--exp_path", "-e", type=str, required=True)
    p.add_argument("--dataset", "-d", type=str, required=True)
    p.add_argument("--ckpt_tag", default="dr", help="which best checkpoint")
    args = p.parse_args()

    import jax
    from hrpe_tpu.config import load_config
    from hrpe_tpu.data.dream import DreamDataset
    from hrpe_tpu.data.loader import DataLoader
    from hrpe_tpu.engine.checkpoints import CheckpointManager
    from hrpe_tpu.engine.metrics import (
        ADD_THRESHOLDS_MM,
        PCK_THRESHOLDS_PX,
        summary_add_pck,
    )
    from hrpe_tpu.engine.trainer import Trainer, _pad_batch
    from hrpe_tpu.parallel import shard_batch

    cfg_path = os.path.join(args.exp_path, "config.yaml")
    cfg = load_config(cfg_path)
    pipeline = "full" if cfg.use_rootnet_with_reg_int_shared_backbone else "depthnet"
    trainer = Trainer(cfg, pipeline)

    # dataset path resolution like the reference: name under data roots
    ds_path = args.dataset
    if not os.path.isdir(ds_path):
        for root in [
            os.path.join(cfg.data_dir, "dream/synthetic"),
            os.path.join(cfg.data_dir, "dream/real"),
            cfg.data_dir,
        ]:
            cand = os.path.join(root, args.dataset)
            if os.path.isdir(cand):
                ds_path = cand
                break
    ds = DreamDataset(
        ds_path,
        color_jitter=False, rgb_augmentation=False, occlusion_augmentation=False,
        robot=cfg.urdf_robot_name,
    )
    loader = DataLoader(ds, cfg.batch_size, shuffle=False,
                        num_workers=cfg.n_dataloader_workers)

    state = trainer.init_state()
    ckpt = CheckpointManager(os.path.join(args.exp_path, "ckpt"))
    state = ckpt.restore(args.ckpt_tag, state)

    alldis = defaultdict(list)
    times = []
    n_images = 0
    for batch in loader:
        batch, n_real = _pad_batch(batch, cfg.batch_size)
        batch = shard_batch(trainer.mesh, batch)
        t0 = time.perf_counter()
        out = trainer.eval_fn(state, batch)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        if pipeline == "full":
            _, m_fk, m_int, _ = jax.device_get(out)
            alldis["dis3d"].extend(m_fk["image_dis3d"][:n_real])
            alldis["dis2d"].extend(m_fk["image_dis2d"][:n_real])
            alldis["jointerror"].extend(m_fk["image_joint_err"][:n_real])
            alldis["dis3d_int"].extend(m_int["image_dis3d"][:n_real])
            alldis["dis2d_int"].extend(m_int["image_dis2d"][:n_real])
        else:
            d = jax.device_get(out)
            alldis["deptherror"].extend(d["depth_abs_err"][:n_real])
        n_images += n_real

    result_dir = os.path.join(args.exp_path, "result")
    os.makedirs(result_dir, exist_ok=True)
    lines = [f"dataset: {ds_path}", f"images: {n_images}"]
    # skip the first (compile) batch for runtime stats
    steady = times[1:] or times
    per_img = float(np.mean(steady)) / cfg.batch_size
    lines.append(f"runtime per image: {per_img*1000:.3f} ms; FPS: {1.0/per_img:.1f}")
    if pipeline == "full":
        summary = summary_add_pck(alldis["dis3d"], alldis["dis2d"])
        summary_int = summary_add_pck(alldis["dis3d_int"], alldis["dis2d_int"])
        lines.append(f"AUC ADD (FK): {summary['ADD/AUC']:.6f}")
        lines.append(f"AUC PCK (FK): {summary['PCK/AUC']:.6f}")
        lines.append(f"AUC ADD (integral): {summary_int['ADD/AUC']:.6f}")
        lines.append(f"AUC PCK (integral): {summary_int['PCK/AUC']:.6f}")
        lines.append(
            "mean joint error (deg): "
            f"{float(np.mean(alldis['jointerror']))/np.pi*180.0:.4f}"
        )
        for t in ADD_THRESHOLDS_MM:
            lines.append(f"ADD_{t}_mm: {summary[f'ADD_{t}_mm']:.4f}")
        for t in PCK_THRESHOLDS_PX:
            lines.append(f"PCK_{t}_pixel: {summary[f'PCK_{t}_pixel']:.4f}")
    else:
        lines.append(f"root depth L1 (m): {float(np.mean(alldis['deptherror'])):.6f}")

    if pipeline == "full" and len(alldis["dis3d"]):
        from hrpe_tpu.engine.metrics import draw_add_curve

        draw_add_curve(
            alldis["dis3d"],
            os.path.join(result_dir, "add_distribution_curve.jpg"),
            title=f"ADD curve — {os.path.basename(ds_path)}",
            auc_value=summary["ADD/AUC"],
        )
        lines.append("wrote result/add_distribution_curve.jpg")

    text = "\n".join(lines)
    with open(os.path.join(result_dir, "summary.txt"), "w") as f:
        f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
