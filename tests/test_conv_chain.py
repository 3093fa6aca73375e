"""Fused int8 BasicBlock-chain kernel correctness (interpret mode, CPU).

Three layers of checking:
  1. Pallas kernel == jnp reference (identical math, exact int8 equality).
  2. jnp reference == hand-rolled conv chain built from
     lax.conv_general_dilated (validates the roll/mask im2col against a
     real convolution).
  3. HRModule(qmode='int8f') ~= HRModule(qmode='int8'): the fused serving
     path matches the unfused int8 path up to glue precision (the XLA
     path casts between convs in bf16; the kernel folds in f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hrpe_tpu.ops.pallas.conv_chain as cc
from hrpe_tpu.ops.pallas.conv_chain import (
    basicblock_chain_int8,
    basicblock_chain_ref,
)
from hrpe_tpu.ops.quant import QTensor


import pytest

pytestmark = pytest.mark.slow  # heavy compile; excluded from the default fast shard

def _rand_chain(rng, B=2, H=8, W=8, C=8, nblk=2):
    xq = rng.randint(-100, 100, (B, H * W, C)).astype(np.int8)
    w = rng.randint(-80, 80, (nblk, 2, 9 * C, C)).astype(np.int8)
    scales = np.abs(rng.randn(nblk, 5, C)).astype(np.float32) * 1e-3 + 1e-4
    return jnp.asarray(xq), jnp.asarray(w), jnp.asarray(scales)


def test_kernel_matches_jnp_reference():
    rng = np.random.RandomState(0)
    xq, w, s = _rand_chain(rng)
    out_k = basicblock_chain_int8(xq, w, s, 8, 8, interpret=True)
    out_r = basicblock_chain_ref(xq, w, s, 8, 8)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_r))


def test_reference_matches_real_convolution():
    # one block, known weights: the roll/mask im2col must equal a real
    # SAME conv with zero padding
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 6, 5, 4
    xq, w, s = _rand_chain(rng, B, H, W, C, nblk=1)

    out = np.asarray(basicblock_chain_ref(xq, w, s, H, W))

    x_img = np.asarray(xq, np.float32).reshape(B, H, W, C)
    w1 = np.asarray(w[0, 0], np.float32).reshape(3, 3, C, C)
    w2 = np.asarray(w[0, 1], np.float32).reshape(3, 3, C, C)

    def conv(x, k):
        return np.asarray(
            jax.lax.conv_general_dilated(
                jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )

    sc = np.asarray(s)
    d1 = conv(x_img, w1)
    q1 = np.clip(np.round(np.maximum(d1 * sc[0, 0] + sc[0, 1], 0)), -127, 127)
    d2 = conv(q1, w2)
    o = np.maximum(d2 * sc[0, 2] + sc[0, 3] + x_img * sc[0, 4], 0)
    expect = np.clip(np.round(o), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(out.reshape(B, H, W, C), expect)


def test_bottleneck_chain_matches_unfused():
    # a 2-block mini-stage with stride-2 + projection on block 0 — the
    # exact structure of a ResNet-50 stage / HRNet stem layer1
    import flax.linen as nn

    from hrpe_tpu.models.resnet import Bottleneck
    from hrpe_tpu.ops.pallas.conv_chain import (
        bottleneck_chain_int8,
        fold_bottleneck_chain,
    )
    from hrpe_tpu.ops.quant import SpecRequest

    class Stage(nn.Module):
        qmode: str | None

        @nn.compact
        def __call__(self, x, train=False):
            if isinstance(x, tuple) and x and isinstance(x[0], SpecRequest):
                # spec-extraction call: same module names -> same params
                r0, r1 = x
                return [
                    Bottleneck(4, 2, True, jnp.bfloat16, qmode=self.qmode,
                               name="b0")(r0, False),
                    Bottleneck(4, 1, False, jnp.bfloat16, qmode=self.qmode,
                               name="b1")(r1, False),
                ]
            x = Bottleneck(4, 2, True, jnp.bfloat16, qmode=self.qmode,
                           name="b0")(x, train)
            x = Bottleneck(4, 1, False, jnp.bfloat16, qmode=self.qmode,
                           name="b1")(x, train)
            return x

    rng = np.random.RandomState(3)
    B, H, W, Cin = 2, 8, 8, 8
    x_f = jnp.asarray(rng.rand(B, H, W, Cin).astype(np.float32) * 2 - 1)

    v = jax.jit(lambda r: Stage(None).init(r, x_f))(jax.random.PRNGKey(0))
    qv = jax.jit(
        lambda v, x: Stage("calib").apply(v, x, mutable=["quant"])
    )(v, x_f)[1]
    variables = {**v, **qv}

    sx = jnp.max(jnp.abs(x_f)) / 127.0
    xq = QTensor(jnp.clip(jnp.round(x_f / sx), -127, 127).astype(jnp.int8), sx)

    out_unfused = Stage("int8f").apply(variables, xq)  # block-by-block path

    specs = Stage("int8f").apply(
        variables, (SpecRequest(Cin), SpecRequest(16))
    )
    blk, s_out = fold_bottleneck_chain(specs, xq.scale)
    q = bottleneck_chain_int8(
        xq.data.reshape(B, H * W, Cin), blk, H, W, stride=2, interpret=True
    )

    # round 5: the unfused path quantizes per-channel, the fused chain
    # per-tensor — compare in DEQUANTIZED space on the coarser grid
    from hrpe_tpu.ops.quant import deq as _deq

    a = np.asarray(_deq(out_unfused, jnp.float32)).reshape(B, -1, 16)
    b = np.asarray(q, np.float32) * float(s_out)
    grid = max(float(np.max(np.asarray(out_unfused.scale))), float(s_out))
    diff = np.abs(a - b)
    assert diff.mean() < 0.5 * grid, (diff.mean(), grid)
    assert diff.max() <= 4 * grid, (diff.max(), grid)


def test_full_net_int8f_matches_int8():
    # end-to-end wiring: flagship model (hrnet32 rootnet + resnet50 reg)
    # with every fused chain active, 64px inputs, interpret-mode kernels.
    # int8f must track the unfused int8 path within quantization noise.
    from hrpe_tpu.models import FullNetConfig, build_full_net

    cfg = FullNetConfig(
        robot_type="dofbot", backbone_name="resnet50",
        rootnet_backbone_name="hrnet32", image_size=64,
        reference_keypoint_id=1,
    )
    rng = np.random.RandomState(7)
    B = 1
    x = jnp.asarray(rng.rand(B, 64, 64, 3).astype(np.float32))
    k = jnp.full((B,), 1000.0, jnp.float32)
    Km = jnp.tile(
        jnp.asarray([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], jnp.float32),
        (B, 1, 1),
    )
    bf16 = build_full_net(cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda r: bf16.init(r, x, x, k, Km, train=False))(
        jax.random.PRNGKey(0)
    )
    calib = build_full_net(cfg, dtype=jnp.bfloat16, qmode="calib")
    qv = jax.jit(
        lambda v, *a: calib.apply(v, *a, train=False, mutable=["quant"])
    )(v, x, x, k, Km)[1]
    variables = {**v, **qv}

    outb = bf16.apply(variables, x, x, k, Km, train=False)
    int8 = build_full_net(cfg, dtype=jnp.bfloat16, qmode="int8")
    out8 = int8.apply(variables, x, x, k, Km, train=False)
    cc.FORCE_INTERPRET = True
    try:
        int8f = build_full_net(cfg, dtype=jnp.bfloat16, qmode="int8f")
        out8f = int8f.apply(variables, x, x, k, Km, train=False)
    finally:
        cc.FORCE_INTERPRET = False

    # uvd within one heatmap cell of the unfused int8 path
    duvd = np.abs(np.asarray(out8["uvd"]) - np.asarray(out8f["uvd"])).max()
    assert duvd < 1.0 / 16.0, duvd
    # fidelity anchor is the bf16 model: through a RANDOM (chaotic) deep
    # net the int8 and int8f paths accumulate independent quantization
    # noise, so comparing them to each other is meaningless for depth —
    # what must hold is that the fused path is no less faithful to bf16
    # than the unfused int8 path (measured: both ~1.8% on the hrnet feat)
    db = np.asarray(outb["depth"], np.float32)
    e8 = np.abs(np.asarray(out8["depth"], np.float32) - db).max()
    e8f = np.abs(np.asarray(out8f["depth"], np.float32) - db).max()
    assert e8f < 2.0 * e8 + 1e-3, (e8, e8f)


def test_hrmodule_fused_matches_unfused():
    from hrpe_tpu.models.hrnet import HRModule

    rng = np.random.RandomState(2)
    C, H, W, B = 8, 8, 8, 2
    x_f = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32) * 2 - 1)

    def mk(q):
        return HRModule((C,), 2, True, jnp.bfloat16, qmode=q)

    # init + one calibration pass records activation ranges
    v = jax.jit(lambda r: mk(None).init(r, [x_f], False))(jax.random.PRNGKey(0))
    qv = jax.jit(
        lambda v, x: mk("calib").apply(v, [x], False, mutable=["quant"])
    )(v, x_f)[1]
    variables = {**v, **qv}

    sx = jnp.max(jnp.abs(x_f)) / 127.0
    xq = QTensor(
        jnp.clip(jnp.round(x_f / sx), -127, 127).astype(jnp.int8), sx
    )

    out_unfused = mk("int8").apply(variables, [xq], False)[0]
    cc.FORCE_INTERPRET = True
    try:
        out_fused = mk("int8f").apply(variables, [xq], False)[0]
    finally:
        cc.FORCE_INTERPRET = False

    # round 5: unfused int8 output scale is per-channel, the fused chain's
    # per-tensor — compare dequantized values on the coarser grid
    from hrpe_tpu.ops.quant import deq as _deq

    a = np.asarray(_deq(out_unfused, jnp.float32))
    b = np.asarray(_deq(out_fused, jnp.float32))
    grid = max(float(np.max(np.asarray(out_unfused.scale))),
               float(np.max(np.asarray(out_fused.scale))))
    diff = np.abs(a - b)
    assert diff.mean() < 0.5 * grid, (diff.mean(), grid)
    assert diff.max() <= 4 * grid, (diff.max(), grid)
    assert (diff <= 1.001 * grid).mean() > 0.90, (diff <= grid).mean()
