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


def _u(rng, shape=None):
    """uniform [0,1) for both RandomState and Generator rngs."""
    if hasattr(rng, "integers"):
        return rng.random(shape) if shape is not None else rng.random()
    return rng.rand(*shape) if shape is not None else rng.rand()


def _ri(rng, *a):
    return (rng.integers if hasattr(rng, "integers") else rng.randint)(*a)


def _background(rng):
    kind = _ri(rng, 4)
    if kind == 0:
        img = np.full((H, W, 3), _ri(rng, 0, 256, 3), np.float32)
    elif kind == 1:
        img = (_u(rng, (H // 8, W // 8, 3)) * 255).astype(np.float32)
        img = img.repeat(8, axis=0).repeat(8, axis=1)
    else:
        c0, c1 = _u(rng, (3,)) * 255, _u(rng, (3,)) * 255
        g = np.linspace(0, 1, W, dtype=np.float32)[None, :, None]
        if _u(rng) < 0.5:
            g = np.linspace(0, 1, H, dtype=np.float32)[:, None, None]
        img = (c0 + (c1 - c0) * g).astype(np.float32)
        img = np.broadcast_to(img, (H, W, 3)).copy()
    for _ in range(_ri(rng, 0, 6)):
        x0, y0 = _ri(rng, 0, W - 20), _ri(rng, 0, H - 20)
        w, h = _ri(rng, 10, 200), _ri(rng, 10, 150)
        img[y0 : y0 + h, x0 : x0 + w] = _u(rng, (3,)) * 255
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
        rng = np.random.RandomState((seed * 1000003 + i) % 2**32)
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


def _sample_scenes_batch(robot, bounds, rng, n, kp_fn, cam=None):
    """Vectorized scene rejection sampling: returns (q (n,dof), R (n,3,3),
    t (n,3), kp_cam (n,K,3), kp2d (n,K,2)). Same acceptance rules as
    _sample_scene, evaluated for whole candidate blocks with ONE batched
    FK call per round (the per-image rejection loop costs ~10 jnp
    dispatches/frame — too slow to feed the device renderer).

    cam: optional (dmin, dmax, center_z, jitter, min_span) camera-sphere
    geometry; the default is the dofbot-scale classic used since r4."""
    import jax.numpy as jnp

    dmin, dmax, cz, jit, min_span = cam or (0.45, 1.0, 0.10, 0.03, 70.0)
    lo, hi = bounds[:, 0], bounds[:, 1]
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
    out = []
    for _ in range(64):
        need = n - len(out)
        if need <= 0:
            break
        M = max(2 * need, 64)
        q = rng.uniform(lo, hi, (M, len(lo)))
        center = np.array([0.0, 0.0, cz]) + rng.uniform(-jit, jit, (M, 3))
        d = rng.uniform(dmin, dmax, M)
        az = rng.uniform(-np.pi, np.pi, M)
        el = rng.uniform(0.05, 1.2, M)
        eye = center + d[:, None] * np.stack(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], -1
        )
        # batched _look_at with up = (0, 0, -1)
        z = center - eye
        z /= np.linalg.norm(z, axis=-1, keepdims=True)
        x = np.cross(z, np.array([0.0, 0.0, -1.0]))
        xn = np.linalg.norm(x, axis=-1, keepdims=True)
        x = np.where(xn > 1e-6, x / np.maximum(xn, 1e-12), [1.0, 0.0, 0.0])
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)  # (M, 3, 3) rows = camera axes
        t = -np.einsum("mij,mj->mi", R, eye)
        kp_base = np.asarray(kp_fn(jnp.asarray(q)))  # (M, K, 3)
        kp_cam = np.einsum("mij,mkj->mki", R, kp_base) + t[:, None]
        proj = kp_cam @ K.T
        kp2d = proj[..., :2] / proj[..., 2:3]
        m = 12.0
        span = kp2d.max(1) - kp2d.min(1)
        ok = (
            (kp_cam[..., 2].min(1) > 0.15)
            & (kp2d[..., 0].min(1) > m)
            & (kp2d[..., 0].max(1) < W - m)
            & (kp2d[..., 1].min(1) > m)
            & (kp2d[..., 1].max(1) < H - m)
            & (span.max(1) > min_span)
        )
        for i in np.nonzero(ok)[0][:need]:
            out.append((q[i], R[i], t[i], kp_cam[i], kp2d[i]))
    if len(out) < n:
        raise RuntimeError("scene sampling failed")
    return [np.stack([o[j] for o in out]) for j in range(5)]


def _write_frame(out_dir, i, img, q, R_root, kp_cam, kp2d, link_names,
                 joint_names, ext="png"):
    """Write one image + pickle-dialect annotation (shared by both paths).

    The device path writes JPEG: PNG encode of a noisy 640x480 frame costs
    ~48 ms on this 1-core host vs ~1.5 ms for JPEG q92 — PNG would be the
    generator's bottleneck — and mild JPEG artifacts are realistic sensor
    augmentation. The loader globs both (data/dream.py:87-95)."""
    from PIL import Image

    if ext == "jpg":
        Image.fromarray(img).save(
            os.path.join(out_dir, f"{i:06d}.jpg"), quality=92
        )
    else:
        Image.fromarray(img).save(
            os.path.join(out_dir, f"{i:06d}.png"), compress_level=3
        )
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


def _write_frame_json(out_dir, i, img, q, R, t, kp_cam, kp2d, robot_name,
                      unit=1.0):
    """Write one DREAM-JSON-dialect frame: {i}.rgb.jpg + {i}.json with the
    original DREAM schema (objects[0].location/quaternion_xyzw/keypoints +
    sim_state.joints; ref README.md:38-67, dream.py:176-229). TCO here is
    the BASE pose; the quaternion carries R_base @ R_NORMAL_UE^-1 so the
    loader's `R_ann @ R_NORMAL_UE` reconstruction returns R_base."""
    import jax.numpy as jnp
    from PIL import Image

    from hrpe_tpu.data.const import JOINT_NAMES
    from hrpe_tpu.data.dream import _DREAM_KP_TO_INDEX, _R_NORMAL_UE
    from hrpe_tpu.utils.geometry import rotmat_to_quat

    Image.fromarray(img).save(os.path.join(out_dir, f"{i:06d}.rgb.jpg"),
                              quality=92)
    R_ann = R @ np.linalg.inv(_R_NORMAL_UE)
    qw = np.asarray(rotmat_to_quat(jnp.asarray(R_ann)[None]))[0]
    inv_names = {k: n for n, k in _DREAM_KP_TO_INDEX[robot_name].items()}
    ann = {
        "objects": [
            {
                "location": [float(v * unit) for v in t],
                "quaternion_xyzw": [float(qw[1]), float(qw[2]),
                                    float(qw[3]), float(qw[0])],
                "keypoints": [
                    {
                        "name": inv_names[k],
                        "location": [float(v * unit) for v in kp_cam[k]],
                        "projected_location": [float(v) for v in kp2d[k]],
                    }
                    for k in range(kp_cam.shape[0])
                ],
                "bounding_box": {
                    "min": [float(v) for v in kp2d.min(0) - 8],
                    "max": [float(v) for v in kp2d.max(0) + 8],
                },
            }
        ],
        "sim_state": {
            "joints": [
                {"name": f"/sim/{jn}", "position": float(v)}
                for jn, v in zip(JOINT_NAMES[robot_name], q)
            ]
        },
    }
    with open(os.path.join(out_dir, f"{i:06d}.json"), "w") as f:
        json.dump(ann, f)


def _run_device(args):
    """TPU-batched generation: scenes sampled in vectorized blocks, frames
    rendered on-device (render.raster.render_flat_batch), host does only
    background compositing + PNG/pickle IO. On this 1-CPU host the numpy
    path renders ~2 frames/s; the device path is bounded by PNG encode."""
    import jax.numpy as jnp

    from hrpe_tpu.data.const import JOINT_BOUNDS, JOINT_NAMES, LINK_NAMES
    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.render import RobotMesh, default_link_meshes
    from hrpe_tpu.render.raster import render_flat_batch_rgba

    import jax

    robot = load_robot(args.robot)
    rm = RobotMesh(robot, default_link_meshes(robot))
    bounds = np.asarray(JOINT_BOUNDS[args.robot], np.float64)
    link_names = LINK_NAMES[args.robot]
    joint_names = JOINT_NAMES[args.robot]
    kp_fn = jax.jit(lambda q: robot.keypoints_fk_only(q))
    pose_fn = jax.jit(lambda q: robot.keypoint_poses(q))
    if args.robot == "dofbot":
        cam = None  # classic dofbot-scale camera sphere (r4 datasets)
    else:
        # scale the camera sphere by the robot's reach so larger arms
        # (panda ~0.9 m, baxter ~1.2 m) frame like the dofbot default
        probe = np.asarray(
            kp_fn(jnp.asarray(np.random.RandomState(0).uniform(
                bounds[:, 0], bounds[:, 1], (256, bounds.shape[0]))))
        )
        reach = float(np.linalg.norm(probe, axis=-1).max())
        cam = (1.3 * reach, 2.9 * reach, 0.29 * reach, 0.09 * reach, 70.0)
        print(f"robot reach {reach:.3f} m -> camera d in "
              f"[{cam[0]:.2f}, {cam[1]:.2f}] m")
    scale = 2
    Ks = np.array(
        [[FX / scale, 0, CX / scale], [0, FY / scale, CY / scale], [0, 0, 1]]
    )
    hw = (H // scale, W // scale)
    B = args.block
    done = 0
    import time

    t0 = time.time()
    while done < args.n:
        nb = min(B, args.n - done)
        i0 = args.start + done
        rng = np.random.RandomState((args.seed * 1000003 + i0) % 2**32)
        q, R, t, kp_cam, kp2d = _sample_scenes_batch(
            robot, bounds, rng, nb, kp_fn, cam=cam
        )
        T = np.tile(np.eye(4), (nb, 1, 1))
        T[:, :3, :3], T[:, :3, 3] = R, t
        verts = rm.posed_verts(
            jnp.asarray(q, jnp.float32), jnp.asarray(T, jnp.float32)
        )
        light = rng.randn(nb, 3)
        light[:, 2] = np.abs(light[:, 2]) + 0.5
        if args.style == "real":
            # pseudo-REAL visual domain (sim2real target): flatter indoor
            # lighting, dark narrow-band body color, heavier sensor noise,
            # photo-like gradient backgrounds (no DR confetti)
            amb = rng.uniform(0.45, 0.62, nb)
            dif = rng.uniform(0.3, 0.5, nb)
            body = 0.12 + 0.22 * rng.rand(nb, 3)
        else:
            amb = rng.uniform(0.25, 0.5, nb)
            dif = rng.uniform(0.5, 0.75, nb)
            body = 0.25 + 0.6 * rng.rand(nb, 3)
        if nb < B:  # keep the jit cache to one (B,...) signature
            pad = B - nb
            verts = jnp.concatenate([verts, verts[-1:].repeat(pad, 0)])
            light = np.concatenate([light, light[-1:].repeat(pad, 0)])
            amb = np.concatenate([amb, amb[-1:].repeat(pad, 0)])
            dif = np.concatenate([dif, dif[-1:].repeat(pad, 0)])
            body = np.concatenate([body, body[-1:].repeat(pad, 0)])
        rgba = np.asarray(
            render_flat_batch_rgba(
                verts, rm.faces, jnp.asarray(Ks), hw, jnp.asarray(light),
                jnp.asarray(amb), jnp.asarray(dif), jnp.asarray(body),
            )
        )
        TWL1 = np.asarray(pose_fn(jnp.asarray(q)))[:, 1]
        R_root = R @ TWL1[:, :3, :3]
        for k in range(nb):
            frng = np.random.default_rng(args.seed * 999983 + i0 + k)
            img = rgba[k, ..., :3].repeat(scale, axis=0).repeat(scale, axis=1)
            mask = (
                (rgba[k, ..., 3] > 0).repeat(scale, axis=0).repeat(scale, axis=1)
            )
            if args.style == "real":
                c0, c1 = _u(frng, (3,)) * 160, _u(frng, (3,)) * 160
                g = np.linspace(0, 1, W, dtype=np.float32)[None, :, None]
                if _u(frng) < 0.5:
                    g = np.linspace(0, 1, H, dtype=np.float32)[:, None, None]
                bg = np.broadcast_to(
                    (c0 + (c1 - c0) * g).astype(np.float32), (H, W, 3)
                ).copy()
            else:
                bg = _background(frng)
            out = np.where(mask[..., None], img.astype(np.float32), bg)
            out = np.clip(
                out
                + frng.standard_normal((H, W, 3), dtype=np.float32)
                * (frng.uniform(4, 10) if args.style == "real"
                   else frng.uniform(0, 6)),
                0,
                255,
            ).astype(np.uint8)
            if args.save_masks:
                from PIL import Image as _Image

                _Image.fromarray(mask.astype(np.uint8) * 255).save(
                    os.path.join(args.out, f"{i0 + k:06d}.mask.png")
                )
            if args.dialect == "json":
                # DREAM synthetic layout stores annotations in CENTIMETRES
                # (ref dream.py:109; loader scale=0.01 keyed off the
                # 'synthetic' path component)
                unit = 100.0 if "synthetic" in str(args.out) else 1.0
                _write_frame_json(
                    args.out, i0 + k, out, q[k], R[k], t[k], kp_cam[k],
                    kp2d[k], args.robot, unit=unit,
                )
            else:
                _write_frame(
                    args.out, i0 + k, out, q[k], R_root[k], kp_cam[k],
                    kp2d[k], link_names, joint_names, ext="jpg",
                )
        done += nb
        if done % (B * 8) == 0 or done == args.n:
            rate = done / (time.time() - t0)
            print(f"{done}/{args.n} frames ({rate:.1f}/s)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--robot", default="dofbot")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--start", type=int, default=0,
                   help="first frame index (shard offset for external chunking)")
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--device", choices=["host", "tpu"], default="host",
                   help="tpu: batched on-device rendering (1 process)")
    p.add_argument("--style", choices=["dr", "real"], default="dr",
                   help="real: pseudo-real visual domain for sim2real "
                        "(device path)")
    p.add_argument("--save-masks", action="store_true",
                   help="also write {i}.mask.png GT silhouettes (device "
                        "path; sim2real frozen-seg stand-in)")
    p.add_argument("--dialect", choices=["pickle", "json"], default="pickle",
                   help="annotation dialect (json = original DREAM schema; "
                        "device path only)")
    p.add_argument("--block", type=int, default=32,
                   help="device path: frames per render batch")
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

    if args.device == "tpu":
        _run_device(args)
        print(f"wrote {args.n} frames to {args.out}")
        return

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
