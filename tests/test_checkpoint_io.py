"""Torch->flax import tests: numerical layout equivalence + name mapping.

Validates the exact tensor conversions the zoo import depends on
(SURVEY.md hard part #3): conv OIHW->HWIO, ConvTranspose with spatial
flip, BN running stats, 1x1-conv->Dense, and the resnet name translation
end-to-end against a live torch module.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from hrpe_tpu.utils.checkpoint_io import (
    convert_tensor,
    import_state_dict,
    load_torch_state_dict,
    translate_resnet_key,
)


def test_conv_equivalence():
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        y_t = tconv(torch.from_numpy(x)).numpy()
    fconv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, use_bias=False)
    kernel = convert_tensor(tconv.weight.detach().numpy(), "conv")
    y_f = fconv.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        y_t.transpose(0, 2, 3, 1), np.asarray(y_f), atol=1e-5
    )


def test_conv_transpose_equivalence():
    tconv = torch.nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1, bias=False)
    x = np.random.RandomState(1).randn(2, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        y_t = tconv(torch.from_numpy(x)).numpy()
    fconv = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME", use_bias=False)
    kernel = convert_tensor(tconv.weight.detach().numpy(), "convT")
    y_f = fconv.apply(
        {"params": {"kernel": jnp.asarray(kernel.copy())}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        y_t.transpose(0, 2, 3, 1), np.asarray(y_f), atol=1e-5
    )


def test_bn_and_linear_equivalence():
    tbn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-1, 1)
        tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()
    x = np.random.RandomState(2).randn(2, 5, 4, 4).astype(np.float32)
    with torch.no_grad():
        y_t = tbn(torch.from_numpy(x)).numpy()
    fbn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        },
    }
    y_f = fbn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(y_t.transpose(0, 2, 3, 1), np.asarray(y_f), atol=1e-5)

    tlin = torch.nn.Linear(6, 3)
    x2 = np.random.RandomState(3).randn(4, 6).astype(np.float32)
    with torch.no_grad():
        y_t2 = tlin(torch.from_numpy(x2)).numpy()
    y_f2 = nn.Dense(3).apply(
        {
            "params": {
                "kernel": jnp.asarray(convert_tensor(tlin.weight.detach().numpy(), "linear")),
                "bias": jnp.asarray(tlin.bias.detach().numpy()),
            }
        },
        jnp.asarray(x2),
    )
    np.testing.assert_allclose(y_t2, np.asarray(y_f2), atol=1e-5)


def _torch_mini_resnet():
    """Tiny torch module with the reference ResNet naming (layerL.i.convJ...)."""
    import torch.nn as tnn

    class Block(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = (
                tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )
                if (stride != 1 or cin != cout)
                else None
            )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    class Mini(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.layer1 = tnn.Sequential(Block(64, 64, 1), Block(64, 64, 1))
            self.layer2 = tnn.Sequential(Block(64, 128, 2), Block(128, 128, 1))
            self.layer3 = tnn.Sequential(Block(128, 256, 2), Block(256, 256, 1))
            self.layer4 = tnn.Sequential(Block(256, 512, 2), Block(512, 512, 1))

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    return Mini()


def test_resnet18_import_end_to_end(tmp_path):
    from hrpe_tpu.models import ResNet

    tmodel = _torch_mini_resnet()
    # randomize running stats so BN import is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    tmodel.eval()
    path = tmp_path / "mini.pth"
    torch.save({"model_state_dict": tmodel.state_dict()}, path)

    fmodel = ResNet("resnet18")
    x = np.random.RandomState(4).randn(1, 3, 64, 64).astype(np.float32)
    variables = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)), False
    )
    sd = load_torch_state_dict(str(path))
    new_vars, report = import_state_dict(sd, variables, translate_resnet_key)
    assert not report["mismatched"], report["mismatched"][:4]
    assert not report["skipped"], report["skipped"][:4]

    with torch.no_grad():
        y_t = tmodel(torch.from_numpy(x)).numpy()
    y_f = fmodel.apply(new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(
        y_t.transpose(0, 2, 3, 1), np.asarray(y_f), atol=2e-4
    )
