"""Per-stage timing of the int8 serving path at batch 256 on TPU.

Complements scripts/profile_bench.py (bf16 stages): times the two conv
trunks in qmode='int8' so the int8 end-to-end number from bench.py can be
decomposed. Same scan-of-M methodology (this hosted runtime memoizes
identical dispatches and charges a fixed per-dispatch RTT).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256
M = 8


def timed(name, fn, *args, base_ms=0.0):
    @jax.jit
    def many(base, *a):
        def body(carry, off):
            out = fn(*((a[0] + off,) + a[1:]))
            total = sum(
                jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(out)
            )
            return carry + total, None

        offsets = jnp.arange(M, dtype=a[0].dtype) * 1e-6 + base
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), offsets)
        return acc

    _ = float(many(jnp.float32(0.0), *args))  # compile+warmup
    times = []
    for rep in range(1, 4):
        base = jnp.float32(rep * 1e-7)
        _ = np.asarray(base)
        t0 = time.perf_counter()
        _ = float(many(base, *args))
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) / M * 1000 - base_ms, 0.0)
    print(f"{name:34s} {dt:8.2f} ms/batch   {BATCH/max(dt,1e-9)*1000:8.0f} img/s",
          flush=True)
    return dt


def calibrated(module, variables, x):
    """Run one calib pass; returns variables with the 'quant' collection."""
    qvars = jax.jit(
        lambda v, a: module.apply(v, a, False, mutable=["quant"])
    )(variables, x)[1]
    return {**variables, **qvars}


def main():
    from hrpe_tpu.models.hrnet import HRNet
    from hrpe_tpu.models.resnet import ResNet

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 256, 256, 3), jnp.float32)

    # hrnet32 feat-only, int8 trunk
    hr_b = HRNet(32, 7, 64, generate_hm=False, generate_feat=True, dtype=dtype)
    vh = jax.jit(lambda r: hr_b.init(r, img, False))(jax.random.PRNGKey(0))
    hr_c = HRNet(32, 7, 64, generate_hm=False, generate_feat=True, dtype=dtype,
                 qmode="calib")
    vq = calibrated(hr_c, vh, img)
    hr_8 = HRNet(32, 7, 64, generate_hm=False, generate_feat=True, dtype=dtype,
                 qmode="int8")
    timed("hrnet32 feat-only int8", lambda x, v: hr_8.apply(v, x, False), img, vq)

    # resnet50 trunk, int8
    rn_b = ResNet("resnet50", dtype)
    vr = jax.jit(lambda r: rn_b.init(r, img, False))(jax.random.PRNGKey(0))
    rn_c = ResNet("resnet50", dtype, qmode="calib")
    vrq = calibrated(rn_c, vr, img)
    rn_8 = ResNet("resnet50", dtype, qmode="int8")
    timed("resnet50 trunk int8", lambda x, v: rn_8.apply(v, x, False), img, vrq)


if __name__ == "__main__":
    main()
