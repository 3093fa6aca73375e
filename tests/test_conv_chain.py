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

    a = np.asarray(out_unfused.data, np.int32)
    b = np.asarray(out_fused.data, np.int32)
    # same quantization grid (scales identical)
    np.testing.assert_allclose(
        float(out_unfused.scale), float(out_fused.scale), rtol=1e-6
    )
    diff = np.abs(a - b)
    assert diff.mean() < 0.5, diff.mean()
    assert diff.max() <= 4, diff.max()
    assert (diff <= 1).mean() > 0.97, (diff <= 1).mean()
