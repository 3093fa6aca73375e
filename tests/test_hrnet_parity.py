"""HRNet numerical parity vs the reference torch implementation.

Builds the REFERENCE's PoseHighResolutionNet (torch, random weights, no
pretrained files needed), exports its state_dict, imports it through our
checkpoint_io name translation into our flax HRNet, and compares forward
outputs on the same input. This validates, in one shot: the stage/fuse/
transition topology, the cls-head wiring, BN semantics, and the importer's
complete HRNet name map.

Skipped when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = [pytest.mark.slow] + [pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lib")), reason="reference not mounted"
)]


def _shim_easydict():
    """The reference needs easydict, absent here — shim a minimal one."""
    import types

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


@pytest.fixture(scope="module")
def ref_hrnet():
    torch = pytest.importorskip("torch")
    _shim_easydict()
    sys.path.insert(0, os.path.join(REF, "lib", "models", "backbones"))
    cwd = os.getcwd()
    os.chdir(REF)  # the reference loads its stage config relative to cwd
    try:
        from HRnet import get_hrnet

        model = get_hrnet(
            type_name=32, num_joints=7, depth_dim=64, pretrain=False,
            generate_feat=True, generate_hm=True,
        )
    finally:
        os.chdir(cwd)
        sys.path.pop(0)
    # randomize BN stats so running-average import is exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    model.eval()
    return model


def test_hrnet_forward_parity(ref_hrnet):
    import torch
    import jax
    import jax.numpy as jnp

    from hrpe_tpu.models import HRNet
    from hrpe_tpu.utils.checkpoint_io import import_state_dict, translate_hrnet_key

    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        hm_t, feat_t = ref_hrnet(torch.from_numpy(x))
    hm_t = hm_t.numpy()
    feat_t = feat_t.numpy()

    fmodel = HRNet(32, 7, 64, generate_hm=True, generate_feat=True)
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(lambda r: fmodel.init(r, xn, False))(jax.random.PRNGKey(0))

    sd = {k: v.detach().numpy() for k, v in ref_hrnet.state_dict().items()}
    new_vars, report = import_state_dict(sd, variables, translate_hrnet_key)
    assert not report["mismatched"], report["mismatched"][:5]
    assert not report["skipped"], report["skipped"][:5]

    hm_f, feat_f = fmodel.apply(new_vars, xn, False)
    np.testing.assert_allclose(
        feat_t, np.asarray(feat_f), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        hm_t.transpose(0, 2, 3, 1), np.asarray(hm_f), atol=5e-3, rtol=1e-3
    )
