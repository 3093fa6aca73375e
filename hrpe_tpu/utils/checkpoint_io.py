"""PyTorch checkpoint -> flax pytree importer.

The reference's model zoo and pretrained backbones are torch state_dicts
(.pk / .pth). This module maps them onto our flax parameter trees so zoo
models reproduce their metrics (SURVEY.md §5.4, hard part #3):

  * conv:   OIHW -> HWIO
  * convT:  torch (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out)
  * linear: (out, in) -> (in, out)
  * BN:     weight/bias -> scale/bias (params);
            running_mean/var -> mean/var (batch_stats)
  * DDP 'module.' prefixes stripped (ref fullnet_test.py:192-198)
  * depthnet chaining remap backbone. -> rootnet_backbone.
    (ref full_net.py:487-500)

Name translation covers our ResNet, HRNet, RootNet and RootNetwithRegInt
module layouts.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pk/.pth checkpoint into numpy (handles the reference's
    {'model_state_dict': ...} wrapper, utils.py:244-268)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            pass  # non-tensor entries
    return out


# ---------------------------------------------------------------------------
# name translation
# ---------------------------------------------------------------------------

def _bn(dst_prefix: Tuple[str, ...], leaf: str):
    """BN leaf translation -> (collection, path, leaf)."""
    m = {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "running_mean": ("batch_stats", "mean"),
        "running_var": ("batch_stats", "var"),
    }
    if leaf in m:
        coll, name = m[leaf]
        return coll, dst_prefix + (name,)
    return None  # num_batches_tracked


def translate_resnet_key(key: str):
    """reference ResNet naming (Resnet.py) -> our ResNet module paths."""
    parts = key.split(".")
    if parts[0] == "conv1":
        return "params", ("conv1", "kernel"), "conv"
    if parts[0] == "bn1":
        r = _bn(("bn1",), parts[1])
        return (r[0], r[1], "bn") if r else None
    m = re.match(r"layer(\d+)", parts[0])
    if m:
        block = f"layer{m.group(1)}_{parts[1]}"
        sub = parts[2]
        if sub.startswith("conv"):
            return "params", (block, sub, "kernel"), "conv"
        if sub.startswith("bn"):
            r = _bn((block, sub), parts[3])
            return (r[0], r[1], "bn") if r else None
        if sub == "downsample":
            if parts[3] == "0":
                return "params", (block, "down_conv", "kernel"), "conv"
            r = _bn((block, "down_bn"), parts[4])
            return (r[0], r[1], "bn") if r else None
    return None


def translate_hrnet_key(key: str):
    """reference HRNet naming (HRnet.py) -> our HRNet module paths."""
    p = key.split(".")
    stem = {"conv1": "stem_conv1", "bn1": "stem_bn1",
            "conv2": "stem_conv2", "bn2": "stem_bn2"}
    if p[0] in stem:
        dst = stem[p[0]]
        if "conv" in p[0]:
            return "params", (dst, "kernel"), "conv"
        r = _bn((dst,), p[1])
        return (r[0], r[1], "bn") if r else None
    if p[0] == "layer1":
        block = f"layer1_{p[1]}"
        sub = p[2]
        if sub.startswith("conv"):
            return "params", (block, sub, "kernel"), "conv"
        if sub.startswith("bn"):
            r = _bn((block, sub), p[3])
            return (r[0], r[1], "bn") if r else None
        if sub == "downsample":
            if p[3] == "0":
                return "params", (block, "down_conv", "kernel"), "conv"
            r = _bn((block, "down_bn"), p[4])
            return (r[0], r[1], "bn") if r else None
    m = re.match(r"transition(\d)", p[0])
    if m:
        stage = f"transition_stage{int(m.group(1)) + 1}"
        i = p[1]
        if len(p) == 4:  # transitionS.i.{0|1}.leaf — conv/bn pair
            if p[2] == "0":
                return "params", (stage, f"t{i}_conv", "kernel"), "conv"
            r = _bn((stage, f"t{i}_bn"), p[3])
            return (r[0], r[1], "bn") if r else None
        else:  # transitionS.i.j.{0|1}.leaf — new-branch chain
            j = p[2]
            if p[3] == "0":
                return "params", (stage, f"t{i}_{j}_conv", "kernel"), "conv"
            r = _bn((stage, f"t{i}_{j}_bn"), p[4])
            return (r[0], r[1], "bn") if r else None
    m = re.match(r"stage(\d)", p[0])
    if m:
        mod = f"stage{m.group(1)}_m{p[1]}"
        if p[2] == "branches":
            b, k, sub = p[3], p[4], p[5]
            block = (mod, f"branch{b}_block{k}")
            if sub.startswith("conv"):
                return "params", block + (sub, "kernel"), "conv"
            r = _bn(block + (sub,), p[6])
            return (r[0], r[1], "bn") if r else None
        if p[2] == "fuse_layers":
            i, j = p[3], p[4]
            if int(j) > int(i):  # Sequential(conv, bn, upsample)
                if p[5] == "0":
                    return "params", (mod, "fuse", f"up_{i}_{j}_conv", "kernel"), "conv"
                r = _bn((mod, "fuse", f"up_{i}_{j}_bn"), p[6])
                return (r[0], r[1], "bn") if r else None
            else:  # chain of Sequential(conv, bn[, relu])
                k = p[5]
                if p[6] == "0":
                    return "params", (mod, "fuse", f"down_{i}_{j}_{k}_conv", "kernel"), "conv"
                r = _bn((mod, "fuse", f"down_{i}_{j}_{k}_bn"), p[7])
                return (r[0], r[1], "bn") if r else None
    if p[0] == "incre_modules":
        i, k, sub = p[1], p[2], p[3]
        block = ("cls_head", f"incre{i}")
        if sub.startswith("conv"):
            return "params", block + (sub, "kernel"), "conv"
        if sub.startswith("bn"):
            r = _bn(block + (sub,), p[4])
            return (r[0], r[1], "bn") if r else None
        if sub == "downsample":
            if p[4] == "0":
                return "params", block + ("down_conv", "kernel"), "conv"
            r = _bn(block + ("down_bn",), p[5])
            return (r[0], r[1], "bn") if r else None
    if p[0] == "downsamp_modules":
        i = p[1]
        if p[2] == "0":
            leaf = "kernel" if p[3] == "weight" else "bias"
            return "params", ("cls_head", f"down{i}_conv", leaf), "conv" if leaf == "kernel" else "bias"
        r = _bn(("cls_head", f"down{i}_bn"), p[3])
        return (r[0], r[1], "bn") if r else None
    if p[0] == "final_feat_layer":
        if p[1] == "0":
            leaf = "kernel" if p[2] == "weight" else "bias"
            return "params", ("cls_head", "final_conv", leaf), "conv" if leaf == "kernel" else "bias"
        r = _bn(("cls_head", "final_bn"), p[2])
        return (r[0], r[1], "bn") if r else None
    if p[0] == "final_layer":
        leaf = "kernel" if p[1] == "weight" else "bias"
        return "params", ("final_hm", leaf), "conv" if leaf == "kernel" else "bias"
    return None


def _dense(key_parts, dst_name):
    leaf = "kernel" if key_parts[-1] == "weight" else "bias"
    kind = "linear" if leaf == "kernel" else "bias"
    return "params", (dst_name, leaf), kind


def translate_fullnet_key(key: str, backbone_is_resnet: bool):
    """RootNetwithRegInt state_dict -> our full-net module paths."""
    p = key.split(".")
    if p[0] == "rootnet_backbone":
        sub = translate_hrnet_key(".".join(p[1:]))
        if sub is None:
            sub = translate_resnet_key(".".join(p[1:]))
        if sub is None:
            return None
        coll, path, kind = sub
        return coll, ("rootnet_backbone",) + path, kind
    if p[0] == "reg_backbone":
        sub = (
            translate_resnet_key(".".join(p[1:]))
            if backbone_is_resnet
            else translate_hrnet_key(".".join(p[1:]))
        )
        if sub is None and not backbone_is_resnet:
            sub = translate_hrnet_key(".".join(p[1:]))
        if sub is None:
            return None
        coll, path, kind = sub
        return coll, ("reg_backbone",) + path, kind
    if p[0] == "deconv_layers":
        idx = int(p[1])
        if idx % 3 == 0:  # ConvTranspose2d
            return "params", (f"deconv{idx // 3}", "kernel"), "convT"
        r = _bn((f"deconv_bn{idx // 3}",), p[2])
        return (r[0], r[1], "bn") if r else None
    if p[0] == "final_layer":
        leaf = "kernel" if p[1] == "weight" else "bias"
        return "params", ("final_layer", leaf), "conv" if leaf == "kernel" else "bias"
    if p[0] == "depth_layer":  # 1x1 conv -> Dense
        leaf = "kernel" if p[1] == "weight" else "bias"
        return "params", ("depth_layer", leaf), "conv1x1_dense" if leaf == "kernel" else "bias"
    if p[0] in ("fc_pose_1", "fc_pose_2", "decpose", "fc_rot_1", "fc_rot_2", "decrot"):
        return _dense(p, p[0])
    m = re.match(r"fc_rot_(\d)$", p[0])
    if m:
        return _dense(p, p[0])
    if p[0].startswith("depth_fc") or p[0] == "depth_bn":
        if p[0] == "depth_bn":
            r = _bn(("depth_bn",), p[1])
            return (r[0], r[1], "bn") if r else None
        return _dense(p, p[0])
    if p[0].startswith("joint_conv_layers"):
        idx = int(p[1])
        if idx % 3 == 0:
            return "params", (f"joint_conv{idx // 3}", "kernel"), "conv"
        r = _bn((f"joint_bn{idx // 3}",), p[2])
        return (r[0], r[1], "bn") if r else None
    if p[0] == "joint_final_layer":
        leaf = "kernel" if p[1] == "weight" else "bias"
        return "params", ("joint_final", leaf), "conv" if leaf == "kernel" else "bias"
    return None


def translate_rootnet_key(key: str, backbone_is_resnet: bool):
    """Standalone RootNet (depth_net.py) -> our RootNet paths."""
    p = key.split(".")
    if p[0] == "backbone":
        sub = (
            translate_resnet_key(".".join(p[1:]))
            if backbone_is_resnet
            else translate_hrnet_key(".".join(p[1:]))
        )
        if sub is None:
            return None
        coll, path, kind = sub
        return coll, ("backbone",) + path, kind
    if p[0] == "depth_layer":
        leaf = "kernel" if p[1] == "weight" else "bias"
        return (
            "params",
            ("depth_head", "depth_fc", leaf),
            "conv1x1_dense" if leaf == "kernel" else "bias",
        )
    return None


def translate_ctrnet_key(key: str):
    """Reference KeyPointSegNet (ctrnet/keypoint_seg_resnet.py:103-149)
    -> our models.ctrnet.KeyPointSegNet paths.

    The per-camera .pth files (mask_inference.py:35-44) are state_dicts of
    that wrapper: `backbone.0.*` (torchvision deeplabv3_resnet50 dilated
    trunk inside a Sequential), `read_out.kps_score_lowres.*` (the single
    keypoint deconv), `classifer.0.*` (torchvision DeepLabHead: ASPP +
    3x3 conv + BN + final 1x1). DataParallel 'module.' prefixes are
    stripped upstream by load_torch_state_dict.
    """
    p = key.split(".")
    if p[0] == "backbone":  # backbone.0.<torchvision resnet key>
        sub = translate_resnet_key(".".join(p[2:]))
        if sub is None:
            return None
        coll, path, kind = sub
        return coll, ("backbone",) + path, kind
    if p[0] == "read_out":  # read_out.kps_score_lowres.{weight,bias}
        if p[2] == "weight":
            return "params", ("kp_deconv", "kernel"), "convT"
        return "params", ("kp_deconv", "bias"), "bias"
    if p[0] == "classifer":  # classifer.0.<DeepLabHead index>...
        h = p[2]
        if h == "0":  # ASPP
            if p[3] == "convs":
                i = int(p[4])
                if i < 4:  # 1x1 + three dilated 3x3 branches
                    if p[5] == "0":
                        return "params", ("aspp", f"b{i}_conv", "kernel"), "conv"
                    r = _bn(("aspp", f"b{i}_bn"), p[6])
                    return (r[0], r[1], "bn") if r else None
                # convs.4 = ASPPPooling(AdaptiveAvgPool, conv, bn, relu)
                if p[5] == "1":
                    return "params", ("aspp", "pool_conv", "kernel"), "conv"
                r = _bn(("aspp", "pool_bn"), p[6])
                return (r[0], r[1], "bn") if r else None
            if p[3] == "project":
                if p[4] == "0":
                    return "params", ("aspp", "proj_conv", "kernel"), "conv"
                r = _bn(("aspp", "proj_bn"), p[5])
                return (r[0], r[1], "bn") if r else None
        if h == "1":
            return "params", ("seg_conv", "kernel"), "conv"
        if h == "2":
            r = _bn(("seg_bn",), p[3])
            return (r[0], r[1], "bn") if r else None
        if h == "4":
            leaf = "kernel" if p[3] == "weight" else "bias"
            return "params", ("seg_out", leaf), ("conv" if leaf == "kernel" else "bias")
    return None


# ---------------------------------------------------------------------------
# tensor layout conversion + tree merge
# ---------------------------------------------------------------------------

def convert_tensor(v: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    if kind == "convT":
        # torch (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out),
        # with the spatial flip that reconciles torch's gradient-of-conv
        # convention with lax.conv_transpose
        return np.transpose(v, (2, 3, 0, 1))[::-1, ::-1]
    if kind == "linear":
        return np.transpose(v)
    if kind == "conv1x1_dense":
        return np.transpose(v[:, :, 0, 0])  # (out,in,1,1) -> (in,out)
    return v


def invert_tensor(v: np.ndarray, kind: str) -> np.ndarray:
    """Inverse of convert_tensor: flax layout -> torch layout."""
    if kind == "conv":
        return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
    if kind == "convT":
        return np.transpose(v[::-1, ::-1], (2, 3, 0, 1))
    if kind == "linear":
        return np.transpose(v)
    if kind == "conv1x1_dense":
        return np.transpose(v)[:, :, None, None]  # (in,out) -> (out,in,1,1)
    return v


def export_state_dict(
    variables: Dict,
    torch_keys,
    translate,
    strict: bool = True,
):
    """Export a flax variables tree into a reference-format state_dict.

    The exact inverse of import_state_dict: for every key the reference
    model expects (`torch_keys`, from its state_dict), map it through
    `translate` to our tree path and invert the layout transform. This is
    what proves checkpoint-compatible outputs both ways (SURVEY §5.4;
    ref save layout utils.py:244-268): a .pk written here loads into the
    reference's torch model with strict=True.

    num_batches_tracked leaves (untranslated) are emitted as 0 — the
    reference only uses them with BN momentum=None, which it never does.
    Returns (state_dict, report).
    """
    import flax

    flat = {}
    for coll in variables:
        for path, leaf in flax.traverse_util.flatten_dict(variables[coll]).items():
            flat[(coll,) + path] = np.asarray(leaf)

    sd, missing = {}, []
    for key in torch_keys:
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0, np.int64)
            continue
        tr = translate(key)
        if tr is None:
            missing.append(key)
            continue
        coll, path, kind = tr
        full = (coll,) + tuple(path)
        if full not in flat:
            missing.append(key)
            continue
        sd[key] = invert_tensor(np.asarray(flat[full], np.float32), kind)
    if strict and missing:
        raise ValueError(f"export missing {len(missing)} keys: {missing[:8]}")
    return sd, {"exported": len(sd), "missing": missing}


def import_state_dict(
    torch_sd: Dict[str, np.ndarray],
    variables: Dict,
    translate,
    strict: bool = False,
    remap_prefix: Tuple[str, str] | None = None,
    key_filter=None,
):
    """Merge a torch state_dict into a flax variables tree.

    translate: key -> (collection, path_tuple, kind) or None.
    remap_prefix: e.g. ('backbone.', 'rootnet_backbone.') for depthnet
    chaining (ref full_net.py:492-498).
    key_filter: optional predicate on the torch key; keys failing it are
    skipped silently — the equivalent of the reference's
    PRETRAINED_LAYERS filter for ImageNet backbone init
    (HRnet.py:572-603, hrnet_w32.yaml:40-52).
    Returns (new_variables, report dict).
    """
    import flax

    flat = {}
    for coll in variables:
        for path, leaf in flax.traverse_util.flatten_dict(variables[coll]).items():
            flat[(coll,) + path] = leaf

    loaded, skipped, mismatched = [], [], []
    for key, val in torch_sd.items():
        if key_filter is not None and not key_filter(key):
            continue
        if remap_prefix and key.startswith(remap_prefix[0]):
            key = remap_prefix[1] + key[len(remap_prefix[0]):]
        tr = translate(key)
        if tr is None:
            if not key.endswith("num_batches_tracked"):
                skipped.append(key)
            continue
        coll, path, kind = tr
        full = (coll,) + tuple(path)
        arr = convert_tensor(val, kind)
        if full not in flat:
            skipped.append(key)
            continue
        if flat[full].shape != arr.shape:
            mismatched.append((key, flat[full].shape, arr.shape))
            continue
        flat[full] = np.asarray(arr, dtype=np.asarray(flat[full]).dtype)
        loaded.append(key)

    if strict and (skipped or mismatched):
        raise ValueError(f"import mismatch: skipped={skipped[:5]} mismatched={mismatched[:5]}")

    out = {}
    for coll in variables:
        sub = {
            path[1:]: leaf for path, leaf in flat.items() if path[0] == coll
        }
        out[coll] = flax.traverse_util.unflatten_dict(sub)
    report = {
        "loaded": len(loaded),
        "skipped": skipped,
        "mismatched": mismatched,
    }
    return out, report
