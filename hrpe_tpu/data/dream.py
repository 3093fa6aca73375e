"""DREAM dataset pipeline — both annotation dialects, fixed-shape output.

The reference's DreamDataset (lib/dataset/dream.py) supports only the
dofbot Isaac-Sim pickle dialect in its current form (the original DREAM
JSON parsing is commented out, dream.py:141,176-229). This implementation
supports BOTH:

  * 'json'   — original DREAM: NNNN.rgb.png/.jpg + NNNN.json with
               objects[0].keypoints {name, location, projected_location},
               quaternion_xyzw/location -> TWO (with the UE axis fix),
               sim_state.joints, bounding_box min/max;
  * 'pickle' — Isaac-Sim sidecar .pkl with dofbot_joint_names_positions
               (degrees), camera_ros_axes_to_robot_root_rot (transposed ->
               TCO rotation), keypoint_dict per-link keypoint_positon /
               keypoint_projection, robot_bounding_box_2d
               (ref dream.py:140-308).

Design difference vs reference: every sample is a dict of FIXED-SHAPE
numpy arrays with GT fully assembled (joints ordered by JOINT_NAMES, TCO
rotation as a matrix, k-value inputs ready) so the device step function
is pure math — the reference's per-batch Python GT loops
(function.py:54-110) do not exist here.
"""

from __future__ import annotations

import json
import os
import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np
from PIL import Image

from ..utils.geometry import quat_to_rotmat  # noqa: F401 (jax variant unused here)
from . import augment as A
from . import bbox as BB
from .const import FLIP_PAIRS_BAXTER, JOINT_NAMES, LINK_NAMES

# frame ids the reference skips (dream.py:27,39-42)
KUKA_TRAIN_DR_BAD_IDS = {83114, 28630}

# original DREAM keypoint names -> our LINK_NAMES per robot. For panda the
# names coincide; kuka uses iiwa7_ prefixes; baxter uses joint-style names.
_DREAM_KP_TO_INDEX = {
    "panda": {n: i for i, n in enumerate(LINK_NAMES["panda"])},
    "kuka": {f"iiwa7_link_{i}": i for i in range(8)},
    "baxter": {
        n: i
        for i, n in enumerate(
            [
                "torso_t0", "right_s0", "left_s0", "right_s1", "left_s1",
                "right_e0", "left_e0", "right_e1", "left_e1", "right_w0",
                "left_w0", "right_w1", "left_w1", "right_w2", "left_w2",
                "right_hand", "left_hand",
            ]
        )
    },
}

_R_NORMAL_UE = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)


def _quat_xyzw_to_rotmat_np(q):
    x, y, z, w = q
    n = np.linalg.norm([w, x, y, z]) + 1e-12
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (w * y + x * z)],
            [2 * (w * z + x * y), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (w * x + y * z), 1 - 2 * (x * x + y * y)],
        ]
    )


def detect_robot(base_dir: str) -> str:
    s = str(base_dir)
    for name in ("panda", "baxter", "kuka", "dofbot"):
        if name in s:
            return name
    raise NotImplementedError(f"cannot infer robot from {base_dir}")


def build_frame_index(base_dir: Path) -> List[Dict]:
    """Scan for frames; supports both *.png (pickle dialect) and
    *.rgb.png/*.rgb.jpg (DREAM json dialect). Ref: dream.py:29-49."""
    entries = []
    pats = ["*.png", "*.jpg"]
    seen = set()
    for pat in pats:
        for p in sorted(base_dir.glob(pat)):
            stem = p.name
            # strip up to two suffixes: 001234.rgb.png -> 001234
            base = Path(p.name).with_suffix("").with_suffix("").name
            try:
                view_id = int(base)
            except ValueError:
                continue
            if base in seen:
                continue
            if view_id == 0 and "panda_synth_test_photo" in str(base_dir):
                continue
            if (
                "kuka_synth_train_dr" in str(base_dir)
                and view_id in KUKA_TRAIN_DR_BAD_IDS
            ):
                continue
            seen.add(base)
            entries.append({"rgb_path": str(p), "view_id": view_id, "base": base})
    return entries


class DreamDataset:
    """Map-style dataset; __getitem__(idx, rng) -> dict of numpy arrays."""

    def __init__(
        self,
        base_dir: str,
        rootnet_resize_hw=(256, 256),
        other_resize_hw=(256, 256),
        color_jitter=True,
        rgb_augmentation=True,
        occlusion_augmentation=True,
        occlu_p=0.5,
        flip=False,
        rotate=False,
        blur_augmentation=False,
        grayscale_augmentation=False,
        strict_crop=True,
        extend_ratio=(0.2, 0.13),
        robot: str | None = None,
        seed: int = 0,
        include_original: bool = False,
        process_truncation: bool = False,
        padding: bool = False,
    ):
        self.include_original = include_original
        self.process_truncation = process_truncation
        self.padding = padding
        self.base_dir = Path(base_dir)
        self.ds_name = os.path.basename(str(base_dir).rstrip("/"))
        self.robot = robot or detect_robot(base_dir)
        self.rootnet_resize_hw = rootnet_resize_hw
        self.other_resize_hw = other_resize_hw
        self.color_jitter = color_jitter
        self.rgb_augmentation = rgb_augmentation
        self.occlusion_augmentation = occlusion_augmentation
        self.occlu_p = occlu_p
        self.flip = flip
        # rootnet-view 90-degree rotation (ref dream.py:64,426-428: the
        # `rotate` flag exists but its call site is `pass` — wired here
        # for real, default off matching the reference's effective state)
        self.rotate = rotate
        # GrayScale / PillowBlur exist in the reference's augmentations
        # (augmentations.py) but are never added to rgb_augmentations
        # (const.py:5-10); exposed here behind explicit flags, default off
        self.blur_augmentation = blur_augmentation
        self.grayscale_augmentation = grayscale_augmentation
        self.strict_crop = strict_crop
        self.extend_ratio = extend_ratio
        self.synthetic = not (
            "panda-3cam" in self.ds_name or "panda-orb" in self.ds_name
        )
        # original DREAM synthetic annotations are in cm (ref dream.py:109)
        self.scale = 0.01 if "synthetic" in str(base_dir) else 1.0
        self.flip_pairs = FLIP_PAIRS_BAXTER if self.robot == "baxter" else None
        self.frames = build_frame_index(self.base_dir)
        if not self.frames:
            raise FileNotFoundError(
                f"no frames (*.png/*.jpg) found under {self.base_dir} — "
                "is the dataset generated/downloaded? "
                "(scripts/make_synth_dataset.py writes synthetic sets)"
            )
        self.rng = np.random.RandomState(seed)
        # bounded decode cache: (rgb, annotation) per frame index.
        # 8192 640x480 RGB frames ~ 7.5 GB — this host has 125 GB, and a
        # cached hit saves ~19 ms of PNG decode on the single data-pipeline
        # core (the training bottleneck); DREAM-scale sets (100k frames)
        # stay bounded. Override via HRPE_DECODE_CACHE.
        self._decode_cache: Dict[int, tuple] = {}
        self._decode_cache_max = int(os.environ.get("HRPE_DECODE_CACHE", 8192))
        self._camera = self._load_camera()
        self.nkpt = len(LINK_NAMES[self.robot])
        self.dof = len(JOINT_NAMES[self.robot])

    def __len__(self):
        return len(self.frames)

    # ------------------------------------------------------------------
    def _load_camera(self):
        p = self.base_dir / "_camera_settings.json"
        if p.exists():
            cams = json.loads(p.read_text())["camera_settings"]
            intr = cams[0]["intrinsic_settings"]
            return tuple(float(intr[k]) for k in ("fx", "fy", "cx", "cy"))
        return None

    def _K_for(self, w, h):
        if self._camera is not None:
            fx, fy, cx, cy = self._camera
        else:
            fx, fy, cx, cy = 320.0, 320.0, w / 2, h / 2
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)

    # ------------------------------------------------------------------
    # annotation dialects -> canonical record
    # ------------------------------------------------------------------

    def _load_annotation(self, frame) -> Dict:
        """Returns dict(joints (dof,), TCO (4,4), kp2d (nkpt,2),
        kp3d (nkpt,3), bbox_strict or None)."""
        stem = Path(frame["rgb_path"])
        pkl = stem.with_suffix("").with_suffix(".pkl")
        jsn = stem.with_suffix("").with_suffix(".json")
        if pkl.exists():
            return self._parse_pickle(pkl)
        if jsn.exists():
            return self._parse_json(jsn)
        raise FileNotFoundError(f"no .pkl/.json annotation next to {stem}")

    def _parse_pickle(self, path) -> Dict:
        """Isaac-Sim pickle dialect (ref dream.py:140-308)."""
        with open(path, "rb") as f:
            ann = pickle.load(f)
        if ann.get("root_rot_convention") != "link1" and not getattr(
            DreamDataset, "_warned_rootrot", False
        ):
            DreamDataset._warned_rootrot = True
            import warnings

            warnings.warn(
                f"{path}: pickle annotation lacks root_rot_convention="
                "'link1' — generated before the round-4 root-rotation fix. "
                "The BASE rotation will be used as the root rotation (up to "
                "~8 cm FK inconsistency); run scripts/fix_dataset_rootrot.py "
                "to migrate the dataset."
            )
        c2b = np.asarray(ann["camera_ros_axes_to_robot_root_rot"], np.float64)
        link_names = LINK_NAMES[self.robot]
        kp = ann["keypoint_dict"]
        by_link = {k.split("/")[-1]: v for k, v in kp.items()}
        kp3d = np.stack(
            [np.asarray(by_link[l]["keypoint_positon"], np.float64) for l in link_names]
        )
        kp2d = np.stack(
            [np.asarray(by_link[l]["keypoint_projection"], np.float64) for l in link_names]
        )
        # TCO: rotation = c2b^T; translation = link1 camera-frame position
        first_movable = link_names[1]
        t = np.asarray(by_link[first_movable]["keypoint_positon"], np.float64)
        TCO = np.eye(4)
        TCO[:3, :3] = c2b.T
        TCO[:3, 3] = t
        joints_deg = ann["dofbot_joint_names_positions"]
        joints = np.array(
            [np.deg2rad(float(joints_deg[n])) for n in JOINT_NAMES[self.robot]],
            np.float64,
        )
        bbox_strict = None
        if "robot_bounding_box_2d" in ann:
            bb = ann["robot_bounding_box_2d"]
            bbox_strict = np.array(
                [bb["x_min"], bb["y_min"], bb["x_max"], bb["y_max"]], np.float64
            )
        return dict(joints=joints, TCO=TCO, kp2d=kp2d, kp3d=kp3d, bbox_strict=bbox_strict)

    def _parse_json(self, path) -> Dict:
        """Original DREAM json dialect (ref dream.py:141,176-229 commented
        parsing + README data layout)."""
        ann = json.loads(Path(path).read_text())
        obj = ann["objects"][0]
        translation = np.asarray(obj["location"], np.float64) * self.scale
        TWO = np.eye(4)
        if "quaternion_xyzw" in obj:
            R = _quat_xyzw_to_rotmat_np(obj["quaternion_xyzw"])
            TWO[:3, :3] = R @ _R_NORMAL_UE
        TWO[:3, 3] = translation
        TCO = TWO  # TWC = I in DREAM (ref dream.py:149,198-201)

        name_to_idx = _DREAM_KP_TO_INDEX[self.robot]
        kp3d = np.full((self.nkpt, 3), np.nan)
        kp2d = np.full((self.nkpt, 2), np.nan)
        for k in obj["keypoints"]:
            i = name_to_idx.get(k["name"])
            if i is None:
                continue
            kp3d[i] = np.asarray(k["location"], np.float64) * self.scale
            kp2d[i] = np.asarray(k["projected_location"], np.float64)
        assert np.isfinite(kp3d).all(), f"missing keypoints in {path}"

        joints_raw = ann["sim_state"]["joints"]
        jmap = {d["name"].split("/")[-1]: float(d["position"]) for d in joints_raw}
        if self.robot == "kuka":
            jmap = {k.replace("iiwa7_", "iiwa_"): v for k, v in jmap.items()}
        joints = []
        for n in JOINT_NAMES[self.robot]:
            joints.append(jmap.get(n, 0.0))
        joints = np.asarray(joints, np.float64)

        bbox_strict = None
        if "bounding_box" in obj:
            bb = obj["bounding_box"]
            bbox_strict = np.array(
                [bb["min"][0], bb["min"][1], bb["max"][0], bb["max"][1]], np.float64
            )
        return dict(joints=joints, TCO=TCO, kp2d=kp2d, kp3d=kp3d, bbox_strict=bbox_strict)

    # ------------------------------------------------------------------
    # sample assembly
    # ------------------------------------------------------------------

    def _view(self, rgb, K, kp3d, kp2d, bbox, bbox_strict_orig, K_orig, resize_hw):
        """Produce one cropped view (ref _get_rootnet_data/_get_other_data,
        dream.py:415-529): square-pad crop -> resize -> K update -> 2D
        keypoints reprojected from 3D -> bboxes mapped into crop space.

        The image path uses the fused C++ crop+resize kernel
        (hrpe_tpu/native) when built; K/keypoint math stays in numpy
        either way (identical geometry)."""
        from .. import native

        fused = native.crop_resize_batch(
            rgb[None], np.asarray(bbox, np.float32)[None], resize_hw[0]
        ) if resize_hw[0] == resize_hw[1] else None
        if fused is not None:
            # replicate only the K update of the crop+resize chain
            import jax.numpy as jnp

            from ..utils import geometry as G

            x1, y1, x2, y2 = [int(v) for v in bbox]
            L = int(max(x2 - x1, y2 - y1))
            ox = int((L - (x2 - x1)) // 2)
            oy = int((L - (y2 - y1)) // 2)
            K_c = np.asarray(K, np.float64).copy()
            K_c[0, 2] -= x1 - ox
            K_c[1, 2] -= y1 - oy
            box = np.array([[0.0, 0.0, L, L]])
            K_r = G.get_K_crop_resize_np(K_c[None], box, resize_hw)[0]
            kp2d_r = np.asarray(kp3d) @ K_r.T
            kp2d_r = kp2d_r[:, :2] / kp2d_r[:, 2:3]
            crop = fused[0]
        else:
            crop, K_c, kp2d_c = BB.square_pad_crop(rgb, bbox, K, kp2d)
            crop, K_r, kp2d_r = A.resize_with_K(crop, K_c, resize_hw, kp3d)

        K_orig_inv = np.linalg.inv(K_orig)
        bb_strict = BB.bbox_through_K(
            bbox_strict_orig, K_orig_inv, K_r, (resize_hw[1], resize_hw[0])
        )
        bb_strict = np.array(
            [
                max(0, bb_strict[0]), max(0, bb_strict[1]),
                min(resize_hw[0], bb_strict[2]), min(resize_hw[1], bb_strict[3]),
            ]
        )
        tight = BB.keypoint_bbox(kp2d_r)
        w_, h_ = tight[2] - tight[0], tight[3] - tight[1]
        er = self.extend_ratio
        bb_ext = BB.extend_bbox(
            tight, w_ * er[0], h_ * er[1], w_ * er[0], h_ * er[1],
            image_size=resize_hw,
        )
        vmask = (
            (kp2d_r[:, 0] < resize_hw[0])
            & (kp2d_r[:, 0] >= 0)
            & (kp2d_r[:, 1] < resize_hw[1])
            & (kp2d_r[:, 1] >= 0)
        ).astype(np.float32)
        return dict(
            images=crop.astype(np.uint8),
            K=K_r.astype(np.float32),
            keypoints_2d=kp2d_r.astype(np.float32),
            keypoints_3d=kp3d.astype(np.float32),
            valid_mask_crop=vmask,
            bbox_strict_bounded=bb_strict.astype(np.float32),
            bbox_gt2d_extended=bb_ext.astype(np.float32),
        )

    def _load_rgb_ann(self, idx: int):
        """Decoded RGB + parsed annotation, LRU-cached.

        Small datasets (the bundled 6-image dofbot set; the reference's
        epoch_size subsampling revisits images too) pay PNG decode + pickle
        parse on EVERY visit otherwise — measured 26 ms of the 40 ms
        per-sample pipeline on this host. Cache is bounded so DREAM-scale
        sets (100k images) don't blow host RAM."""
        hit = self._decode_cache.get(idx)
        if hit is not None:
            return hit
        frame = self.frames[idx]
        img = Image.open(frame["rgb_path"])
        rgb = np.asarray(img.convert("RGB")) if img.mode != "RGB" else np.asarray(img)
        ann = self._load_annotation(frame)
        if len(self._decode_cache) < self._decode_cache_max:
            self._decode_cache[idx] = (rgb, ann)
        return rgb, ann

    def __getitem__(self, idx: int, rng: np.random.RandomState | None = None) -> Dict:
        rng = rng or self.rng
        frame = self.frames[idx]
        rgb, ann = self._load_rgb_ann(idx)
        h, w = rgb.shape[:2]
        K_orig = self._K_for(w, h)
        kp2d, kp3d = ann["kp2d"], ann["kp3d"]

        if self.process_truncation:
            # canvas growth for frame-truncated robots (ref dream.py:337
            # via roboutils process_truncation)
            rgb, kp2d, K_orig = BB.process_truncation(rgb, kp2d, K_orig)
            h, w = rgb.shape[:2]
        if self.padding:
            rgb, kp2d, K_orig = BB.process_padding(rgb, kp2d, K_orig, pad=30)
            h, w = rgb.shape[:2]

        tight = BB.keypoint_bbox(kp2d)
        bbox = BB.expand_bbox(
            tight, w, h, strict=self.strict_crop,
            rng=None if self.strict_crop else rng,
        )
        bbox_ext_orig = BB.extend_bbox(tight, 20, 20, 20, 20, image_size=(w, h))
        if ann["bbox_strict"] is not None:
            bs = ann["bbox_strict"]
            bbox_strict = np.array(
                [max(0, bs[0]), max(0, bs[1]), min(w, bs[2]), min(h, bs[3])]
            )
        else:
            bbox_strict = bbox_ext_orig.copy()

        valid_mask = (
            (kp2d[:, 0] < 640.0) & (kp2d[:, 0] >= 0)
            & (kp2d[:, 1] < 480.0) & (kp2d[:, 1] >= 0)
        ).astype(np.float32)

        # augmentations (train only; distributions per dream.py:346-389)
        if self.color_jitter and rng.random_sample() < 0.4:
            rgb = A.color_jitter(rgb, rng)
        if self.occlusion_augmentation and rng.random_sample() < self.occlu_p:
            rgb = A.apply_occlusion(rgb, bbox, rng)
        if self.rgb_augmentation:
            # restrict the enhancement window to the square-pad crop
            # extent — pixels outside it never reach either view (the
            # contrast mean stays full-image, see pil_photometric)
            bx1, by1, bx2, by2 = [float(v) for v in bbox]
            Lb = max(bx2 - bx1, by2 - by1)
            ox = (Lb - (bx2 - bx1)) / 2.0
            oy = (Lb - (by2 - by1)) / 2.0
            roi = (int(by1 - oy) - 1, int(by2 + oy) + 2,
                   int(bx1 - ox) - 1, int(bx2 + ox) + 2)
            rgb = A.pil_photometric(rgb, rng, p=0.3, roi=roi)
        if self.blur_augmentation:
            rgb = A.pil_blur(rgb, rng, p=0.4)
        if self.grayscale_augmentation:
            rgb = A.grayscale(rgb, rng, p=0.3)

        # rootnet-view rotation (ref augmentations.py:327-357), p=0.5
        if self.rotate and rng.random_sample() <= 0.5:
            rgb_r, K_r, kp2d_r, kp3d_r, (bbox_r, bbox_strict_r) = A.rotate_90(
                rgb, K_orig, kp2d, kp3d, (bbox, bbox_strict)
            )
            root = self._view(
                rgb_r, K_r.copy(), kp3d_r, kp2d_r, bbox_r,
                bbox_strict_r, K_r, self.rootnet_resize_hw,
            )
        else:
            root = self._view(
                rgb, K_orig.copy(), kp3d, kp2d.copy(), bbox,
                bbox_strict, K_orig, self.rootnet_resize_hw,
            )
        # rootnet-only horizontal flip (ref dream.py:437-439 applies
        # FlipAugmentation to the root view only)
        if self.flip and rng.random_sample() <= 0.5:
            img_f, K_f, kp_f = A.flip_image_K(
                root["images"], root["K"].astype(np.float64),
                root["keypoints_2d"].astype(np.float64), self.flip_pairs,
            )
            root["images"] = img_f
            root["K"] = K_f.astype(np.float32)
            root["keypoints_2d"] = kp_f.astype(np.float32)
        other = self._view(
            rgb, K_orig.copy(), kp3d, kp2d.copy(), bbox,
            bbox_strict, K_orig, self.other_resize_hw,
        )

        sample_extra = (
            {"images_original": rgb.astype(np.uint8)} if self.include_original else {}
        )
        if self.include_original:
            # GT silhouette sidecar ({stem}.mask.png, written by
            # make_synth_dataset --save-masks): the frozen-seg stand-in for
            # sim2real on synthetic pseudo-real sets (VERDICT r4 #5) — the
            # reference's CtRNet masks come from a pretrained .pth that
            # does not exist for generated robots
            mp = Path(frame["rgb_path"])
            mp = mp.with_name(mp.name.split(".")[0] + ".mask.png")
            if mp.exists():
                from PIL import Image as _Image

                sample_extra["mask_original"] = (
                    np.asarray(_Image.open(mp), np.uint8) > 127
                ).astype(np.uint8)
        return {
            **sample_extra,
            "image_id": np.int32(idx),
            "TCO": ann["TCO"].astype(np.float32),
            "K_original": K_orig.astype(np.float32),
            "jointpose": ann["joints"].astype(np.float32),
            "keypoints_2d_original": kp2d.astype(np.float32),
            "keypoints_3d_original": kp3d.astype(np.float32),
            "valid_mask": valid_mask,
            "bbox_strict_bounded_original": bbox_strict.astype(np.float32),
            "bbox_gt2d_extended_original": bbox_ext_orig.astype(np.float32),
            "root": root,
            "other": other,
        }


def collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    """Stack samples into the flat batch layout the engine consumes."""
    def stack(path):
        a, b = (path.split("/") + [None])[:2]
        if b is None:
            return np.stack([s[a] for s in samples])
        return np.stack([s[a][b] for s in samples])

    extra = (
        {"images_original": stack("images_original")}
        if "images_original" in samples[0]
        else {}
    )
    if "mask_original" in samples[0]:
        extra["mask_original"] = stack("mask_original")
    return {
        **extra,
        "TCO": stack("TCO"),
        "K_original": stack("K_original"),
        "jointpose": stack("jointpose"),
        "keypoints_2d_original": stack("keypoints_2d_original"),
        "valid_mask": stack("valid_mask"),
        "bbox_strict_bounded_original": stack("bbox_strict_bounded_original"),
        "root_images": stack("root/images"),
        "root_K": stack("root/K"),
        "root_keypoints_3d": stack("root/keypoints_3d"),
        "root_valid_mask_crop": stack("root/valid_mask_crop"),
        "root_bbox_strict_bounded": stack("root/bbox_strict_bounded"),
        "root_bbox_gt2d_extended": stack("root/bbox_gt2d_extended"),
        "other_images": stack("other/images"),
        "other_K": stack("other/K"),
        "other_keypoints_2d": stack("other/keypoints_2d"),
        "other_keypoints_3d": stack("other/keypoints_3d"),
        "other_valid_mask_crop": stack("other/valid_mask_crop"),
    }
