#!/usr/bin/env python
"""Checkpoint-parity artifact chain (VERDICT r4 #7).

Demonstrates reference-format checkpoint compatibility on ARTIFACTS, not
unit tests:

1. loads this framework's trained orbax checkpoint (best_dr),
2. exports it to a reference-format .pk (utils.py:244-268 save layout:
   {epoch, auc_add, model_state_dict} with torch OIHW/deconv/linear
   layouts) via checkpoint_io.export_state_dict,
3. builds the REFERENCE's torch RootNetwithRegInt (tests/ref_harness.py,
   CPU) and loads the .pk with strict=True,
4. runs BOTH models over the same eval batches (identical preprocessed
   inputs from our DreamDataset) and computes the same FK-path metrics
   (ADD AUC over 0-0.1 m, joint L1) for each side,
5. appends the same-input metric table to PARITY.md.

The .pk itself (~240 MB) stays on disk (experiments/.../parity_export.pk,
gitignored); the committed evidence is the table + this script.

Usage:
  python scripts/make_parity_artifact.py -e experiments/dofbot_full \
      -d data/dofbot_synth_test_dr -n 64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_path", "-e", default="experiments/dofbot_full")
    p.add_argument("--dataset", "-d", default="data/dofbot_synth_test_dr")
    p.add_argument("-n", type=int, default=64, help="eval images")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out_md", default="PARITY.md")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from hrpe_tpu.config import load_config
    from hrpe_tpu.data.dream import DreamDataset
    from hrpe_tpu.data.loader import DataLoader
    from hrpe_tpu.engine.checkpoints import restore_state
    from hrpe_tpu.engine.losses import k_values as compute_k
    from hrpe_tpu.engine.metrics import summary_add_pck
    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.models import build_full_net
    from hrpe_tpu.utils.checkpoint_io import (
        export_state_dict,
        translate_fullnet_key,
    )
    from ref_harness import available, make_ref_model

    if not available():
        sys.exit("reference not mounted at /root/reference")

    cfg = load_config(os.path.join(args.exp_path, "config.yaml"))
    robot = load_robot(cfg.urdf_robot_name)
    S = int(cfg.other_image_size)

    # --- our model + trained weights ------------------------------------
    model = build_full_net(cfg.full_net_config())  # f32 for parity
    zero = jnp.zeros((1, S, S, 3), jnp.float32)
    K0 = jnp.eye(3)[None]
    variables = jax.jit(
        lambda r: model.init(r, zero, zero, jnp.ones((1,)), K0, train=False)
    )(jax.random.PRNGKey(0))
    variables = dict(variables)
    restored = restore_state(
        os.path.join(args.exp_path, "ckpt", "best_dr"),
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )
    variables["params"] = restored["params"]
    variables["batch_stats"] = restored["batch_stats"]
    print("restored trained weights")

    # --- reference torch model + exported .pk ---------------------------
    ref = make_ref_model(
        cfg.backbone_name,
        image_size=S,
        robot_type=cfg.urdf_robot_name,
        reference_keypoint_id=cfg.reference_keypoint_id,
        randomize=False,
    )
    torch_keys = list(ref.state_dict().keys())
    sd, report = export_state_dict(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        torch_keys,
        lambda k: translate_fullnet_key(
            k, cfg.backbone_name.startswith("resnet")
        ),
        strict=False,
    )
    # init_pose/init_rot are constant registered buffers in the reference
    # (full_net.py:100-123), not parameters in our model: keep the torch
    # model's own constructor values so strict load passes
    own = ref.state_dict()
    missing = [k for k in report["missing"]]
    for k in missing:
        sd[k] = own[k].numpy()
    assert set(missing) <= {"init_pose", "init_rot"}, missing
    pk_path = os.path.join(args.exp_path, "ckpt", "parity_export.pk")
    meta = None
    meta_p = os.path.join(args.exp_path, "ckpt", "best_dr.meta.json")
    if os.path.exists(meta_p):
        import json

        meta = json.load(open(meta_p))
    torch.save(
        {
            "epoch": meta["epoch"] if meta else -1,
            "auc_add": meta["score"] if meta else float("nan"),
            "model_state_dict": {k: torch.from_numpy(np.asarray(v).copy())
                                 for k, v in sd.items()},
        },
        pk_path,
    )
    print(f"wrote reference-format checkpoint {pk_path} "
          f"({os.path.getsize(pk_path)/1e6:.0f} MB, {len(sd)} tensors)")

    # strict round-trip: the reference model must accept it verbatim
    loaded = torch.load(pk_path, map_location="cpu", weights_only=False)
    ref.load_state_dict(loaded["model_state_dict"], strict=True)
    ref.eval()
    print("reference model loaded the .pk with strict=True")

    # --- same-input eval ------------------------------------------------
    ds = DreamDataset(
        args.dataset, color_jitter=False, rgb_augmentation=False,
        occlusion_augmentation=False, robot=cfg.urdf_robot_name,
    )
    loader = DataLoader(ds, args.batch, shuffle=False, num_workers=1)

    @jax.jit
    def fwd(variables, other, root, kv, K):
        return model.apply(variables, other, root, kv, K, train=False)

    root_id = int(cfg.reference_keypoint_id)

    def fk_metrics(pose, rot6, trans, gt_kp3d, gt_joints):
        kp = np.asarray(
            robot.keypoints_root(
                jnp.asarray(pose), jnp.asarray(rot6), jnp.asarray(trans),
                root=root_id,
            )
        )
        dis3d = np.linalg.norm(kp - gt_kp3d, axis=-1).mean(-1)
        jerr = np.rad2deg(np.abs(np.asarray(pose) - gt_joints)).mean(-1)
        return dis3d, jerr

    rows = {"ours": {"dis3d": [], "jerr": []},
            "torch_pk": {"dis3d": [], "jerr": []}}
    deltas = {}
    n_done = 0
    for batch in loader:
        other = batch["other_images"].astype(np.float32) / 255.0
        root = batch["root_images"].astype(np.float32) / 255.0
        kv = np.asarray(
            compute_k(batch["root_bbox_strict_bounded"], batch["root_K"])
        )
        K = batch["other_K"].astype(np.float32)
        gt_kp = batch["other_keypoints_3d"]
        gt_j = batch["jointpose"]

        out = fwd(variables, jnp.asarray(other), jnp.asarray(root),
                  jnp.asarray(kv), jnp.asarray(K))
        o_pose = np.asarray(out.pose)
        o_rot = np.asarray(out.rot)
        o_trans = np.asarray(out.trans)

        with torch.no_grad():
            t_out = ref(
                torch.from_numpy(other.transpose(0, 3, 1, 2)),
                torch.from_numpy(root.transpose(0, 3, 1, 2)),
                torch.from_numpy(kv.astype(np.float32)),
                torch.from_numpy(K),
            )
        t_pose, t_rot, t_trans = [v.numpy() for v in t_out[:3]]

        for name, arrs in (("pose", (o_pose, t_pose)),
                           ("rot", (o_rot, t_rot)),
                           ("trans", (o_trans, t_trans))):
            d = float(np.abs(arrs[0] - arrs[1]).max())
            deltas[name] = max(deltas.get(name, 0.0), d)

        d3, je = fk_metrics(o_pose, o_rot, o_trans, gt_kp, gt_j)
        rows["ours"]["dis3d"].extend(d3)
        rows["ours"]["jerr"].extend(je)
        d3, je = fk_metrics(t_pose, t_rot, t_trans, gt_kp, gt_j)
        rows["torch_pk"]["dis3d"].extend(d3)
        rows["torch_pk"]["jerr"].extend(je)
        n_done += len(other)
        print(f"{n_done} images", flush=True)
        if n_done >= args.n:
            break

    table = {}
    for side in rows:
        s = summary_add_pck(
            np.asarray(rows[side]["dis3d"]),
            np.zeros(len(rows[side]["dis3d"])),
        )
        table[side] = {
            "auc_add": float(s["ADD/AUC"]),
            "mean_add_m": float(np.mean(rows[side]["dis3d"])),
            "joint_l1_deg": float(np.mean(rows[side]["jerr"])),
        }
    rel = abs(table["ours"]["auc_add"] - table["torch_pk"]["auc_add"]) / max(
        table["ours"]["auc_add"], 1e-9
    )

    lines = [
        "",
        "## Checkpoint-parity artifact run (same inputs, trained weights)",
        "",
        f"Export: `{pk_path}` — reference save layout (ref utils.py:244-268), "
        f"loaded by the reference `RootNetwithRegInt` with `strict=True`.",
        f"Eval: first {n_done} images of `{args.dataset}`, identical "
        "preprocessed batches through both models "
        "(`scripts/make_parity_artifact.py`).",
        "",
        "| side | AUC(ADD) | mean ADD (m) | joint L1 (deg) |",
        "|---|---|---|---|",
    ]
    for side, label in (("ours", "flax (orbax best_dr)"),
                        ("torch_pk", "reference torch (exported .pk)")):
        t = table[side]
        lines.append(
            f"| {label} | {t['auc_add']:.4f} | {t['mean_add_m']:.4f} "
            f"| {t['joint_l1_deg']:.2f} |"
        )
    lines += [
        "",
        f"Max output deltas (|ours - torch|): pose {deltas['pose']:.2e}, "
        f"rot {deltas['rot']:.2e}, trans {deltas['trans']:.2e} — AUC(ADD) "
        f"relative gap {rel*100:.3f}% (baseline envelope 0.5%).",
        "",
    ]
    with open(args.out_md, "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
