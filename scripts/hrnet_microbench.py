"""Decompose the int8 HRNet-W32 trunk cost at batch 256.

profile_int8.py measured the whole trunk at ~45 ms/batch while the
marginal int8 conv rates (epilogue_microbench.py) put the conv work at
~20 ms — this script times the pieces (stem, one HRModule per stage
shape, one FuseUnit, upsample, ClsHead) to find the non-conv overhead.

Methodology: scan-of-M distinct dispatches, single fetch (see bench.py);
every number includes the ~3.5-4 ms/batch fixed RTT floor — compare
DIFFERENCES, or subtract the null line.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

M = 8
B = 256


def timed(name, fn, *args):
    @jax.jit
    def many(base, *a):
        def body(carry, off):
            out = fn(*((a[0] + off,) + a[1:]))
            total = sum(
                jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(out)
            )
            return carry + total, None

        offsets = jnp.arange(M, dtype=jnp.float32).astype(a[0].dtype) + base
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), offsets)
        return acc

    _ = float(many(jnp.zeros((), args[0].dtype), *args))
    times = []
    for rep in range(1, 4):
        base = jnp.asarray(rep % 2, args[0].dtype)
        _ = np.asarray(base)
        t0 = time.perf_counter()
        _ = float(many(base, *args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / M * 1000
    print(f"{name:44s} {dt:8.2f} ms/batch", flush=True)
    return dt


def int8_variables(mod, init_args):
    """init in bf16, run one calib pass, return int8-serving variables."""
    v = jax.jit(lambda r: mod(None).init(r, *init_args, False))(
        jax.random.PRNGKey(0)
    )
    qv = jax.jit(
        lambda v, *a: mod("calib").apply(v, *a, False, mutable=["quant"])
    )(v, *init_args)[1]
    return {**v, **qv}


def quantize_list(xs):
    """bf16 branch tensors -> QTensors (as the trunk pipelines them)."""
    from hrpe_tpu.ops.quant import QTensor

    out = []
    for x in xs:
        s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        out.append(
            QTensor(
                jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(
                    jnp.int8
                ),
                s,
            )
        )
    return out


def main():
    from hrpe_tpu.models.hrnet import ClsHead, FuseUnit, HRModule, upsample_nearest

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    @jax.jit
    def null(x):
        return jnp.sum(x)

    x0 = jnp.asarray(rng.rand(8, 8), jnp.float32)
    timed("null (RTT floor)", lambda x: x * 2.0, x0)

    def branch_inputs(chs, hws):
        return [jnp.asarray(rng.rand(B, s, s, c), dt) for c, s in zip(chs, hws)]

    # one stage-3 HRModule (3 branches, 4 blocks each + fuse)
    ch3, hw3 = (32, 64, 128), (64, 32, 16)
    xs3 = branch_inputs(ch3, hw3)
    mk = lambda q: HRModule(ch3, 4, True, dt, qmode=q)
    v = int8_variables(mk, (xs3,))
    timed("HRModule stage3 int8 (x7 in trunk)",
          lambda x0, v, x1, x2: mk("int8").apply(v, [x0, x1, x2], False),
          xs3[0], v, xs3[1], xs3[2])
    # fused-chain serving twin: branches run as one Pallas kernel each.
    # QTensor inputs (as the trunk pipelines them); x0 perturbed via its
    # int8 payload so the scan sees distinct dispatches.
    q3 = quantize_list(xs3)
    timed("HRModule stage3 int8f (fused chains)",
          lambda d0, v, q0, q1, q2: mk("int8f").apply(
              v, [type(q0)(d0, q0.scale), q1, q2], False),
          q3[0].data, v, q3[0], q3[1], q3[2])

    # one stage-4 HRModule (4 branches)
    ch4, hw4 = (32, 64, 128, 256), (64, 32, 16, 8)
    xs4 = branch_inputs(ch4, hw4)
    mk4 = lambda q: HRModule(ch4, 4, True, dt, qmode=q)
    v4 = int8_variables(mk4, (xs4,))
    timed("HRModule stage4 int8 (x3 in trunk)",
          lambda x0, v, x1, x2, x3: mk4("int8").apply(v, [x0, x1, x2, x3], False),
          xs4[0], v4, xs4[1], xs4[2], xs4[3])
    q4 = quantize_list(xs4)
    timed("HRModule stage4 int8f (fused chains)",
          lambda d0, v, q0, q1, q2, q3_: mk4("int8f").apply(
              v, [type(q0)(d0, q0.scale), q1, q2, q3_], False),
          q4[0].data, v4, q4[0], q4[1], q4[2], q4[3])

    # resnet50 trunk: whole backbone int8 vs fused-chain int8f
    from hrpe_tpu.models.resnet import ResNet

    x_img = jnp.asarray(rng.rand(B, 256, 256, 3), dt)
    mkr = lambda q: ResNet("resnet50", dt, qmode=q)
    vr = int8_variables(mkr, (x_img,))
    timed("resnet50 trunk int8",
          lambda x, v: mkr("int8").apply(v, x, False), x_img, vr)
    timed("resnet50 trunk int8f (fused stages)",
          lambda x, v: mkr("int8f").apply(v, x, False), x_img, vr)

    # the fuse unit alone at stage-4 shapes
    mkf = lambda q: FuseUnit(ch4, ch4, 4, dt, qmode=q)
    vf = int8_variables(mkf, (xs4,))
    timed("FuseUnit stage4 int8 alone",
          lambda x0, v, x1, x2, x3: mkf("int8").apply(v, [x0, x1, x2, x3], False),
          xs4[0], vf, xs4[1], xs4[2], xs4[3])

    # upsample alone (the fuse unit's broadcast-reshape path)
    u1 = jnp.asarray(rng.rand(B, 32, 32, 32), dt)
    timed("upsample_nearest x2 (256,32,32,32)",
          lambda x: upsample_nearest(x, 2), u1)
    u2 = jnp.asarray(rng.rand(B, 8, 8, 32), dt)
    timed("upsample_nearest x8 (256,8,8,32)",
          lambda x: upsample_nearest(x, 8), u2)

    # cls head alone
    mkc = lambda q: ClsHead(dt, qmode=q)
    vc = int8_variables(mkc, (xs4,))
    timed("ClsHead int8",
          lambda x0, v, x1, x2, x3: mkc("int8").apply(v, [x0, x1, x2, x3], False),
          xs4[0], vc, xs4[1], xs4[2], xs4[3])


if __name__ == "__main__":
    main()
