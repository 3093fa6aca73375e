#!/usr/bin/env python
"""Generate a domain-randomized synthetic dataset by rendering the robot.

The reference trains on DREAM / Isaac-Sim renders that are not
redistributable; this generator produces the same pickle-dialect dataset
(ref lib/dataset/dream.py:140-308 schema — keypoint_dict,
camera_ros_axes_to_robot_root_rot, dofbot_joint_names_positions,
robot_bounding_box_2d) from the framework's own FK + host Phong
rasterizer, so training/eval runs end-to-end with zero external data.

Domain randomization: joint angles uniform inside JOINT_BOUNDS, camera on
a random viewing sphere, random light direction / body color / ambient,
and composited over randomized backgrounds (solid / noise / gradient /
random rectangles).

Usage:
  python scripts/make_synth_dataset.py --robot dofbot \
      --n 4096 --out data/dofbot_synth_train_dr --seed 0 --workers 8
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FX, FY, CX, CY = 502.0, 502.0, 320.0, 240.0
W, H = 640, 480


def _look_at(eye, center, up):
    """OpenCV camera (z forward, y down): world->cam R, t."""
    z = center - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    n = np.linalg.norm(x)
    if n < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    else:
        x = x / n
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)  # rows = camera axes in world coords
    t = -R @ eye
    return R, t


def _background(rng):
    kind = rng.randint(4)
    if kind == 0:
        img = np.full((H, W, 3), rng.randint(0, 256, 3), np.float64)
    elif kind == 1:
        img = rng.rand(H // 8, W // 8, 3) * 255
        img = np.kron(img, np.ones((8, 8, 1)))
    else:
        c0, c1 = rng.rand(3) * 255, rng.rand(3) * 255
        g = np.linspace(0, 1, W)[None, :, None]
        if rng.rand() < 0.5:
            g = np.linspace(0, 1, H)[:, None, None]
        img = c0 + (c1 - c0) * g
        img = np.broadcast_to(img, (H, W, 3)).copy()
    for _ in range(rng.randint(0, 6)):
        x0, y0 = rng.randint(0, W - 20), rng.randint(0, H - 20)
        w, h = rng.randint(10, 200), rng.randint(10, 150)
        img[y0 : y0 + h, x0 : x0 + w] = rng.rand(3) * 255
    return img


def _sample_scene(robot, bounds, rng):
    """Random joints + camera with all keypoints in frame."""
    import jax.numpy as jnp

    lo, hi = bounds[:, 0], bounds[:, 1]
    for _ in range(64):
        q = rng.uniform(lo, hi)
        # camera on a sphere around a point above the base
        center = np.array([0.0, 0.0, 0.10]) + rng.uniform(-0.03, 0.03, 3)
        d = rng.uniform(0.45, 1.0)
        az = rng.uniform(-np.pi, np.pi)
        el = rng.uniform(0.05, 1.2)
        eye = center + d * np.array(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
        )
        up = np.array([0.0, 0.0, -1.0])
        R, t = _look_at(eye, center, up)
        kp_base = np.asarray(robot.keypoints_fk_only(jnp.asarray(q)[None]))[0]
        kp_cam = kp_base @ R.T + t
        if kp_cam[:, 2].min() < 0.15:
            continue
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
        proj = kp_cam @ K.T
        kp2d = proj[:, :2] / proj[:, 2:3]
        m = 12.0
        if (
            kp2d[:, 0].min() > m
            and kp2d[:, 0].max() < W - m
            and kp2d[:, 1].min() > m
            and kp2d[:, 1].max() < H - m
        ):
            span = kp2d.max(0) - kp2d.min(0)
            if max(span) > 70:  # robot not degenerate-small in frame
                return q, R, t, kp_cam, kp2d
    raise RuntimeError("scene sampling failed")


def _render_frame(rm, q, R, t, rng, scale=2):
    """Phong render at 1/scale res, upsampled — 4x faster, still sharp
    enough for 256-crop training."""
    import jax.numpy as jnp

    from hrpe_tpu.render.shade import render_phong

    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    verts = np.asarray(rm.posed_verts(jnp.asarray(q)[None], jnp.asarray(T)[None]))[0]
    Ks = np.array([[FX / scale, 0, CX / scale], [0, FY / scale, CY / scale], [0, 0, 1]])
    light = rng.randn(3)
    light[2] = abs(light[2]) + 0.5
    body = 0.25 + 0.6 * rng.rand(3)
    img, depth = render_phong(
        verts,
        rm.faces,
        Ks,
        (H // scale, W // scale),
        light_dir=tuple(light / np.linalg.norm(light)),
        ambient=rng.uniform(0.25, 0.5),
        diffuse=rng.uniform(0.5, 0.75),
        color=tuple(body),
        background=None,
    )
    mask = np.isfinite(depth)
    # nearest-neighbor upsample mask+shaded to full res
    img = np.kron(img.astype(np.float64), np.ones((scale, scale, 1)))
    mask = np.kron(mask, np.ones((scale, scale), bool))
    bg = _background(rng)
    out = np.where(mask[..., None], img, bg)
    # mild sensor noise
    out = np.clip(out + rng.randn(H, W, 3) * rng.uniform(0, 6), 0, 255)
    return out.astype(np.uint8)


def _worker(args):
    out_dir, robot_name, lo_i, hi_i, seed = args
    # hard override: this environment exports JAX_PLATFORMS=axon globally
    # and the axon plugin re-overrides JAX_PLATFORMS at registration, so
    # only HRPE_FORCE_CPU (see hrpe_tpu/__init__.py) reliably pins CPU —
    # without it every worker contends for the one tunnel TPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["HRPE_FORCE_CPU"] = "1"
    from PIL import Image

    from hrpe_tpu.data.const import JOINT_BOUNDS, JOINT_NAMES, LINK_NAMES
    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.render import RobotMesh, default_link_meshes

    robot = load_robot(robot_name)
    rm = RobotMesh(robot, default_link_meshes(robot))
    bounds = np.asarray(JOINT_BOUNDS[robot_name], np.float64)
    link_names = LINK_NAMES[robot_name]
    joint_names = JOINT_NAMES[robot_name]
    import jax.numpy as jnp

    for i in range(lo_i, hi_i):
        rng = np.random.RandomState(seed * 1000003 + i)
        q, R, t, kp_cam, kp2d = _sample_scene(robot, bounds, rng)
        img = _render_frame(rm, q, R, t, rng)
        Image.fromarray(img).save(os.path.join(out_dir, f"{i:06d}.png"))
        # The dialect's TCO is the ROOT-LINK (keypoint 1) pose: rotation of
        # link1's frame in camera coords, translation at link1. The
        # reference consumes it directly as the root pose with
        # reference_keypoint_id=1 (function.py:86-93 'gt_trans和gt_rot本来
        # 就是相对于root的'); writing the BASE rotation here (round 1-3)
        # made the rot target inconsistent with the FK keypoint losses by
        # up to 8 cm and broke full-net training.
        TWL1 = np.asarray(robot.keypoint_poses(jnp.asarray(q)[None]))[0, 1]
        R_root = R @ TWL1[:3, :3]
        kp_dict = {
            f"/World/robot/{ln}": {
                "keypoint_positon": [float(v) for v in kp_cam[k]],
                "keypoint_projection": [float(v) for v in kp2d[k]],
            }
            for k, ln in enumerate(link_names)
        }
        x1, y1 = kp2d.min(0) - 8
        x2, y2 = kp2d.max(0) + 8
        ann = {
            # stamp guards fix_dataset_rootrot.py idempotency
            "root_rot_convention": "link1",
            "camera_ros_axes_to_robot_root_rot": R_root.T.tolist(),
            "dofbot_joint_names_positions": {
                jn: float(np.rad2deg(v)) for jn, v in zip(joint_names, q)
            },
            "keypoint_dict": kp_dict,
            "robot_bounding_box_2d": {
                "x_min": float(x1),
                "y_min": float(y1),
                "x_max": float(x2),
                "y_max": float(y2),
            },
        }
        with open(os.path.join(out_dir, f"{i:06d}.pkl"), "wb") as f:
            pickle.dump(ann, f)
    return hi_i - lo_i


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--robot", default="dofbot")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--start", type=int, default=0,
                   help="first frame index (shard offset for external chunking)")
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "_camera_settings.json"), "w") as f:
        json.dump(
            {
                "camera_settings": [
                    {"intrinsic_settings": {"fx": FX, "fy": FY, "cx": CX, "cy": CY}}
                ]
            },
            f,
        )

    chunks = []
    per = -(-args.n // args.workers)
    for w in range(args.workers):
        lo = args.start + w * per
        hi = min(args.start + (w + 1) * per, args.start + args.n)
        if lo < hi:
            chunks.append((args.out, args.robot, lo, hi, args.seed))

    if args.workers <= 1:
        for c in chunks:
            _worker(c)
    else:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        with ctx.Pool(len(chunks)) as pool:
            for done in pool.imap_unordered(_worker, chunks):
                print(f"chunk done: {done} frames", flush=True)
    print(f"wrote {args.n} frames to {args.out}")


if __name__ == "__main__":
    main()
