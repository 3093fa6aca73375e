"""Microbenchmark: why HRNet-W32's narrow convs are slow on v5e, and what fixes them.

Hypothesis (README round-1): XLA lowers a 3x3 conv with C_in=C_out=32 as
tap-by-tap matmuls with K=32, N=32 -> 1/16 of the 128x128 MXU = ~12 TF/s
(exactly what we measured). Candidate fixes, measured here one by one:

  conv3x3_c32        the baseline lax.conv (what models/hrnet.py uses today)
  dot_k288_n32       pure matmul [M,288]x[288,32]  (im2col contraction, no gather cost)
  dot_k32_n32        pure matmul [M,32]x[32,32]    (the per-tap shape XLA allegedly uses)
  im2col_conv        concat 9 shifted slices -> 1x1 conv 288->32 (XLA, materialized)
  conv3x3_c64/128/256  wider convs for the TF/s-vs-width curve

Methodology identical to bench.py: M_REPS distinct dispatches inside one
jitted lax.scan, single fetch, unique inputs per rep (this hosted runtime
memoizes byte-identical dispatches).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M_REPS = 8


def timed(name, fn, flops, *args):
    @jax.jit
    def many(base, *a):
        def body(carry, off):
            out = fn(*((a[0] + off,) + a[1:]))
            return carry + jnp.sum(out.astype(jnp.float32)), None

        offsets = jnp.arange(M_REPS, dtype=jnp.bfloat16) * 1e-2 + base
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), offsets)
        return acc

    _ = float(many(jnp.bfloat16(0.0), *args))
    times = []
    for rep in range(1, 4):
        base = jnp.bfloat16(rep * 1e-3)
        _ = np.asarray(base)
        t0 = time.perf_counter()
        _ = float(many(base, *args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / M_REPS
    print(f"{name:28s} {dt*1000:9.3f} ms   {flops/dt/1e12:7.1f} TF/s")
    return dt


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    B = 256
    rng = np.random.RandomState(0)

    print("== conv width curve (3x3, SAME, bf16, NHWC) ==")
    for C, HW in [(32, 64), (64, 32), (128, 16), (256, 8)]:
        x = jnp.asarray(rng.rand(B, HW, HW, C), jnp.bfloat16)
        w = jnp.asarray(rng.rand(3, 3, C, C) * 0.01, jnp.bfloat16)
        flops = 2 * B * HW * HW * 9 * C * C
        timed(f"conv3x3 C={C} {HW}x{HW}", conv3x3, flops, x, w)

    print("== pure matmuls (the building blocks) ==")
    M = B * 64 * 64
    for K, N in [(32, 32), (288, 32), (288, 128), (128, 128), (256, 256)]:
        a = jnp.asarray(rng.rand(M, K), jnp.bfloat16)
        b = jnp.asarray(rng.rand(K, N) * 0.01, jnp.bfloat16)
        flops = 2 * M * K * N
        timed(f"dot [{M//1000}k,{K}]x[{K},{N}]",
              lambda a, b: jnp.dot(a, b), flops, a, b)

    print("== XLA im2col variants for C=32 @ 64x64 ==")
    C, HW = 32, 64
    x = jnp.asarray(rng.rand(B, HW, HW, C), jnp.bfloat16)
    w9 = jnp.asarray(rng.rand(9 * C, C) * 0.01, jnp.bfloat16)
    flops = 2 * B * HW * HW * 9 * C * C

    def im2col_conv(x, w9):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, di : di + HW, dj : dj + HW, :]
            for di in range(3)
            for dj in range(3)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B,HW,HW,288)
        return jax.lax.dot_general(
            patches, w9, (((3,), (0,)), ((), ()))
        )

    timed("im2col concat + dot K=288", im2col_conv, flops, x, w9)

    def tap_sum_conv(x, w9):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, HW, HW, C), jnp.float32)
        for t in range(9):
            di, dj = divmod(t, 3)
            sl = xp[:, di : di + HW, dj : dj + HW, :]
            acc = acc + jax.lax.dot_general(
                sl, w9[t * C : (t + 1) * C], (((3,), (0,)), ((), ()))
            ).astype(jnp.float32)
        return acc.astype(jnp.bfloat16)

    timed("9-tap shifted 1x1 sum", tap_sum_conv, flops, x, w9)


if __name__ == "__main__":
    main()
