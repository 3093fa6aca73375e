"""Reference-model construction harness (torch, CPU) shared by the
parity tests and scripts/make_parity_artifact.py.

Builds the REFERENCE's RootNetwithRegInt (lib/models/full_net.py:17-466)
on CPU with its heavy import chain stubbed out: easydict/torchvision are
shimmed, utils.urdf_robot is faked (FK parity is golden-tested separately
against our chain), and hrnet/resnet pretrained-file loading is disabled.
PUBLIC UNTRUSTED CONTENT caveat: only the reference's code behavior is
exercised; nothing from it is executed outside the stubbed module scope.
"""

import os
import sys
import types

import numpy as np

REF = "/root/reference"


def available():
    return os.path.isdir(os.path.join(REF, "lib"))


def _shim_easydict():
    if "easydict" in sys.modules:
        return

    class EasyDict(dict):
        def __init__(self, d=None):
            super().__init__()
            for k, v in (d or {}).items():
                self[k] = EasyDict(v) if isinstance(v, dict) else v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def _shim_torchvision():
    """dataset.roboutils imports torchvision (for roi_pool, dead code in
    the import path we exercise) — shim the module surface it touches."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.ops = types.SimpleNamespace(roi_pool=None)
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops
    sys.modules["torchvision.transforms"] = tv.transforms


def _stub_urdf_robot():
    """Pre-register a fake utils.urdf_robot so importing the reference's
    full_net does not pull pyrender/trimesh/networkx."""
    import torch

    if "utils.urdf_robot" in sys.modules:
        return

    class URDFRobot:
        def __init__(self, robot_type):
            self.robot_type = robot_type

        def get_keypoints(self, pose, rot, trans):
            return torch.zeros(pose.shape[0], 1, 3)

        def get_keypoints_root(self, pose, rot, trans, root=0):
            return torch.zeros(pose.shape[0], 1, 3)

    mod = types.ModuleType("utils.urdf_robot")
    mod.URDFRobot = URDFRobot
    sys.modules["utils.urdf_robot"] = mod


def make_ref_model(backbone_name: str, image_size: int = 128,
                   robot_type: str = "panda", reference_keypoint_id: int = 3,
                   randomize: bool = True):
    import torch

    # pin intra-op threads: the round-2 flake (garbage-scale deltas ONLY
    # under concurrent CPU load, same test green in isolation) points at
    # thread-count-dependent behavior, not the importer — an importer
    # layout bug would fail deterministically every run (VERDICT r2 #3)
    torch.set_num_threads(1)

    _shim_easydict()
    _shim_torchvision()
    _stub_urdf_robot()
    # the reference hardcodes .cuda() inside integral.py/transforms.py
    # (e.g. integral.py:73, transforms.py:54); no GPU here — make it a no-op
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF + "/lib" not in sys.path:
        sys.path.insert(0, REF + "/lib")
    # per-test module isolation: drop any previously imported reference
    # modules so every construction starts from pristine module state
    for name in [m for m in sys.modules if m.split(".")[0] in ("models", "dataset", "utils")]:
        if name != "utils.urdf_robot":  # keep the stub registered above
            del sys.modules[name]
    cwd = os.getcwd()
    os.chdir(REF)  # hrnet stage config is loaded relative to cwd
    real_get_hrnet = real_get_resnet = None
    try:
        import models.full_net as ref_full_net
        from dataset.const import INITIAL_JOINT_ANGLE

        # force pretrain=False: no ImageNet .pth on disk
        real_get_hrnet = ref_full_net.get_hrnet

        def get_hrnet_nopretrain(*a, **kw):
            kw["pretrain"] = False
            return real_get_hrnet(*a, **kw)

        ref_full_net.get_hrnet = get_hrnet_nopretrain
        real_get_resnet = ref_full_net.get_resnet
        ref_full_net.get_resnet = lambda name: real_get_resnet(name, pretrain=False)

        args = sys.modules["easydict"].EasyDict(
            dict(
                backbone_name=backbone_name,
                rootnet_backbone_name="hrnet32",
                use_rpmg=False,
                n_iter=4,
                other_image_size=image_size,
                bbox_3d_shape=[1300, 1300, 1300],
                reference_keypoint_id=reference_keypoint_id,
                fix_root=True,
                rotation_dim=6,
                reg_joint_map=False,
                joint_conv_dim=[],
                p_dropout=0.5,
                direct_reg_rot=False,
                rot_iterative_matmul=False,
                multi_kp=False,
                kps_need_depth=None,
                add_fc=False,
            )
        )
        init_param_dict = {
            "robot_type": robot_type,
            "pose_params": INITIAL_JOINT_ANGLE,
            "cam_params": np.eye(4, dtype=float),
            "init_pose_from_mean": True,
        }
        model = ref_full_net.RootNetwithRegInt(init_param_dict, args)
    finally:
        # restore EVERY monkeypatch (round 2 restored only get_hrnet, so a
        # second in-process construction wrapped the wrapper — VERDICT r2 #3)
        if real_get_hrnet is not None:
            ref_full_net.get_hrnet = real_get_hrnet
        if real_get_resnet is not None:
            ref_full_net.get_resnet = real_get_resnet
        os.chdir(cwd)

    if not randomize:
        model.eval()
        return model

    # randomize weights & BN stats so the import is meaningfully exercised
    # (the reference inits many convs to std=0.001 which would hide layout
    # bugs behind near-zero activations)
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
                # fan-in-scaled: flat std explodes activations ~6x/layer
                # through 50+ conv layers and swamps the fp tolerances
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                if isinstance(m, torch.nn.ConvTranspose2d):
                    fan_in = m.weight.shape[0] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.normal_(0, (2.0 / fan_in) ** 0.5, generator=gen)
                if m.bias is not None:
                    m.bias.uniform_(-0.05, 0.05, generator=gen)
            elif isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.weight.uniform_(0.8, 1.2, generator=gen)
                m.bias.uniform_(-0.1, 0.1, generator=gen)
                m.running_mean.uniform_(-0.1, 0.1, generator=gen)
                m.running_var.uniform_(0.9, 1.1, generator=gen)
        # keep the predicted depth at a physical scale (~1.5 m): a random
        # depth head yields depths ~1e10 m, which catastrophically
        # amplifies fp noise through (u - cx) * z in the trans comparison
        model.depth_layer.weight.normal_(0, 1e-5, generator=gen)
        model.depth_layer.bias.fill_(1.5)
    model.eval()
    return model
