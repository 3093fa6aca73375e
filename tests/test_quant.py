"""QuantConv: plain-mode parity with nn.Conv, calib mechanics, int8 error.

The int8 path's end-to-end fidelity + speed are measured on the TPU in
bench.py (XLA:CPU lowers int8 convs through a generic ~1000x-slow
fallback, so full-model int8 on CPU is infeasible); these tests pin the
things that must hold on any backend, at tiny shapes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.ops.quant import QuantConv


def _mkconv(qmode, **kw):
    return QuantConv(8, (3, 3), qmode=qmode, **kw)


def test_plain_mode_matches_nn_conv():
    """qmode=None must be bit-compatible with nn.Conv (same params, init,
    output) so existing checkpoints/imports are untouched."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    for kw in (
        dict(kernel_size=(3, 3), padding=[(1, 1), (1, 1)]),
        dict(kernel_size=(1, 1)),
        dict(kernel_size=(3, 3), strides=(2, 2), padding="SAME", use_bias=True),
        dict(kernel_size=(3, 3), padding=[(2, 2), (2, 2)], kernel_dilation=(2, 2)),
    ):
        kw.setdefault("use_bias", False)
        ref_m = nn.Conv(8, **kw)
        got_m = QuantConv(8, **kw)
        v_ref = ref_m.init(jax.random.PRNGKey(1), x)
        v_got = got_m.init(jax.random.PRNGKey(1), x)
        assert jax.tree.map(jnp.shape, v_ref) == jax.tree.map(jnp.shape, v_got), kw
        np.testing.assert_array_equal(
            np.asarray(v_ref["params"]["kernel"]), np.asarray(v_got["params"]["kernel"])
        )
        np.testing.assert_allclose(
            np.asarray(ref_m.apply(v_ref, x)),
            np.asarray(got_m.apply(v_got, x)),
            rtol=1e-6, atol=1e-6,
        )


def test_calib_records_running_max():
    m = _mkconv("calib", use_bias=False)
    x1 = jnp.full((1, 4, 4, 4), 2.0)
    x2 = jnp.full((1, 4, 4, 4), 5.0)
    v = m.init(jax.random.PRNGKey(0), x1)
    # per-channel (cin,) running max since round 5
    np.testing.assert_array_equal(np.asarray(v["quant"]["act_max"]), 0.0)
    assert v["quant"]["act_max"].shape == (4,)
    _, upd = m.apply(v, x1, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(upd["quant"]["act_max"]), 2.0)
    _, upd = m.apply({**v, **upd}, x2, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(upd["quant"]["act_max"]), 5.0)
    # a smaller batch must not shrink the recorded max
    _, upd2 = m.apply({"params": v["params"], **upd}, x1, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(upd2["quant"]["act_max"]), 5.0)


def test_int8_error_bounded():
    """int8 output must match f32 within the quantization error bound."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    m_f = QuantConv(16, (3, 3), use_bias=False)
    v = m_f.init(jax.random.PRNGKey(2), x)
    y_f = m_f.apply(v, x)

    m_c = QuantConv(16, (3, 3), use_bias=False, qmode="calib")
    vc = m_c.init(jax.random.PRNGKey(2), x)
    _, q = m_c.apply({"params": v["params"], **vc}, x, mutable=["quant"])

    m_8 = QuantConv(16, (3, 3), use_bias=False, qmode="int8")
    y_8 = m_8.apply({"params": v["params"], **q}, x)

    err = np.abs(np.asarray(y_8) - np.asarray(y_f))
    rel = err.max() / np.abs(np.asarray(y_f)).max()
    # 16-ch 3x3 conv sums 144 terms of products with ~0.4%+0.4% quant
    # noise each; relative error should be well below 2%
    assert rel < 0.02, rel


def test_requant_identity_when_off():
    """qmode=None Requant is a no-op that declares NO variables, so the
    training/bf16 variable trees are untouched."""
    from hrpe_tpu.ops.quant import Requant

    m = Requant(None)
    x = jnp.ones((2, 4, 4, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert v == {}, v
    np.testing.assert_array_equal(np.asarray(m.apply({}, x)), np.asarray(x))


def test_requant_calib_then_int8_roundtrip():
    from hrpe_tpu.ops.quant import QTensor, Requant, deq

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
    mc = Requant("calib")
    v = mc.init(jax.random.PRNGKey(0), x)
    _, q = mc.apply(v, x, mutable=["quant"])
    # per-channel (C,) running max since round 5
    np.testing.assert_allclose(
        np.asarray(q["quant"]["out_max"]),
        np.max(np.abs(np.asarray(x)), axis=(0, 1, 2)),
    )
    m8 = Requant("int8")
    out = m8.apply(q, x)
    assert isinstance(out, QTensor) and out.data.dtype == jnp.int8
    assert out.scale.shape == (3,)
    err = np.abs(np.asarray(deq(out, jnp.float32)) - np.asarray(x))
    assert err.max() <= float(np.max(out.scale)) * 0.5 + 1e-7


def test_pipelined_block_fidelity():
    """A residual block chain in pipelined int8 (Requant between convs,
    QTensor inputs) must track the f32 output within quantization noise,
    and calib must create every 'quant' entry the int8 apply reads."""
    from hrpe_tpu.models.resnet import BasicBlock

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)

    blk_f = BasicBlock(16, 1, False)
    v = blk_f.init(jax.random.PRNGKey(1), x, False)
    y_f = blk_f.apply(v, x, False)

    blk_c = BasicBlock(16, 1, False, qmode="calib")
    vc = blk_c.init(jax.random.PRNGKey(1), x, False)
    _, q = blk_c.apply({**v, "quant": vc.get("quant", {})}, x, False,
                       mutable=["quant"])

    blk_8 = BasicBlock(16, 1, False, qmode="int8")
    out = blk_8.apply({**v, **q}, x, False)
    from hrpe_tpu.ops.quant import QTensor, deq

    assert isinstance(out, QTensor)
    y_8 = np.asarray(deq(out, jnp.float32))
    rel = np.abs(y_8 - np.asarray(y_f)).max() / np.abs(np.asarray(y_f)).max()
    assert rel < 0.05, rel
