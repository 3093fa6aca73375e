"""Microbenchmark: does XLA fuse the int8 dequant+BN+ReLU+requant epilogue
into the conv, or does the int32 conv output round-trip HBM?

Times (scan-of-M methodology, see bench.py):
  * raw int8 conv (int32 out, reduced in-graph)
  * int8 conv + full serving epilogue (scale, bias, relu, requant -> int8)
  * a 4-conv chain with epilogues (the steady-state trunk pattern)
at the shapes that dominate the two trunks, plus the fused Pallas NHWC
integral decode vs the jnp reference on the real heatmap shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M = 8
B = 256


def timed(name, fn, flops, *args, itemsize=1):
    @jax.jit
    def many(base, *a):
        def body(carry, off):
            out = fn(*((a[0] + off,) + a[1:]))
            return carry + jnp.sum(out.astype(jnp.float32)), None

        offsets = (jnp.arange(M) % 3).astype(a[0].dtype) + base
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
    dt = float(np.median(times)) / M
    print(f"{name:44s} {dt*1000:8.3f} ms  {flops/dt/1e12:7.1f} TF/s", flush=True)
    return dt


def conv_i8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def epilogue(y, scale, bias, out_scale):
    y = y.astype(jnp.float32) * scale + bias
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * (1.0 / out_scale)), -127, 127).astype(jnp.int8)


def main():
    rng = np.random.RandomState(0)

    for C, HW, kk in [(256, 16, 3), (64, 64, 3), (32, 64, 3), (256, 64, 1)]:
        x = jnp.asarray(rng.randint(-100, 100, (B, HW, HW, C)), jnp.int8)
        w = jnp.asarray(rng.randint(-100, 100, (kk, kk, C, C)), jnp.int8)
        scale = jnp.asarray(rng.rand(C) * 1e-4 + 1e-4, jnp.float32)
        bias = jnp.asarray(rng.rand(C), jnp.float32)
        flops = 2 * B * HW * HW * kk * kk * C * C

        timed(f"i8 conv{kk}x{kk} C={C} {HW}x{HW} raw",
              lambda x, w: conv_i8(x, w), flops, x, w)
        timed(f"i8 conv{kk}x{kk} C={C} {HW}x{HW} +epilogue",
              lambda x, w, s, b: epilogue(conv_i8(x, w), s, b, 0.05),
              flops, x, w, scale, bias)

        def chain4(x, w, s, b):
            for _ in range(4):
                x = epilogue(conv_i8(x, w), s, b, 0.05)
            return x

        timed(f"i8 conv{kk}x{kk} C={C} {HW}x{HW} chain4+epi",
              chain4, 4 * flops, x, w, scale, bias)

    # fused NHWC integral decode vs jnp reference, real shape
    from hrpe_tpu.models.integral import heatmap_expectations_nhwc
    from hrpe_tpu.ops.pallas.integral_decode_nhwc import (
        fused_heatmap_expectations_nhwc,
    )

    hm = jnp.asarray(rng.randn(B, 64, 64, 448) * 2, jnp.bfloat16)
    passes = B * 64 * 64 * 448  # elements
    timed("decode jnp nhwc (B,64,64,448)",
          lambda h: heatmap_expectations_nhwc(h, 7, 64), passes, hm)
    timed("decode pallas nhwc (B,64,64,448)",
          lambda h: fused_heatmap_expectations_nhwc(h, 7, 64), passes, hm)
    a = heatmap_expectations_nhwc(hm, 7, 64)
    b = fused_heatmap_expectations_nhwc(hm, 7, 64)
    print("decode max |pallas - jnp|:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
