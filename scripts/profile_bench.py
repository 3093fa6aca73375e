"""Module-level timing of the flagship full net at batch 256 on TPU.

Times each compute stage separately (scan-of-M device-side, single fetch,
same methodology as bench.py) so optimization effort lands where the
milliseconds are: rootnet hrnet32 trunk, resnet50 reg trunk, deconv+final
head, integral decode, MLP heads + FK.
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
    """fn must be jittable and return a pytree; times M scanned applies.

    Every timed dispatch gets UNIQUE inputs (offsets shifted per rep, same
    trick as bench.py) — this hosted runtime memoizes byte-identical
    dispatches, which would otherwise reduce the measurement to the ~30ms
    fetch RTT. `base_ms` (a measured null-dispatch round trip, already
    divided by M) is subtracted so stage timings are comparable and sum
    roughly to the e2e number.
    """

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
        _ = np.asarray(base)  # ensure the new constant is on device
        t0 = time.perf_counter()
        _ = float(many(base, *args))
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) / M * 1000 - base_ms, 0.0)
    print(f"{name:34s} {dt:8.2f} ms/batch   {BATCH/max(dt,1e-9)*1000:8.0f} img/s")
    return dt


def null_dispatch_ms():
    """Measure the fixed dispatch+fetch round trip of one many() call, /M."""

    @jax.jit
    def nothing(base):
        return jnp.sum(base)

    _ = float(nothing(jnp.float32(0.0)))
    times = []
    for rep in range(1, 4):
        base = jnp.float32(rep * 1e-7)
        _ = np.asarray(base)
        t0 = time.perf_counter()
        _ = float(nothing(base))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / M * 1000


def main():
    from hrpe_tpu.models import FullNetConfig, build_full_net
    from hrpe_tpu.models.hrnet import HRNet
    from hrpe_tpu.models.resnet import ResNet

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 256, 256, 3), jnp.float32)

    base_ms = null_dispatch_ms()
    print(f"{'null dispatch+fetch (subtracted)':34s} {base_ms:8.2f} ms/batch")

    # 1. rootnet trunk: hrnet32 feat-only
    hr = HRNet(32, 7, 64, generate_hm=False, generate_feat=True, dtype=dtype)
    vh = jax.jit(lambda r: hr.init(r, img, False))(jax.random.PRNGKey(0))
    timed("hrnet32 feat-only (rootnet)", lambda x, v: hr.apply(v, x, False), img, vh,
          base_ms=base_ms)

    # 2. reg trunk: resnet50 raw feature map
    rn = ResNet("resnet50", dtype)
    vr = jax.jit(lambda r: rn.init(r, img, False))(jax.random.PRNGKey(0))
    timed("resnet50 trunk (reg)", lambda x, v: rn.apply(v, x, False), img, vr,
          base_ms=base_ms)

    # 3. full net end-to-end
    cfg = FullNetConfig(robot_type="panda", backbone_name="resnet50",
                        rootnet_backbone_name="hrnet32", image_size=256)
    net = build_full_net(cfg, dtype=dtype)
    k = jnp.full((BATCH,), 1000.0, jnp.float32)
    K = jnp.tile(jnp.asarray([[320.0, 0, 128], [0, 320, 128], [0, 0, 1]],
                             jnp.float32), (BATCH, 1, 1))
    vf = jax.jit(lambda r: net.init(r, img, img, k, K, train=False))(jax.random.PRNGKey(0))
    timed("full net e2e", lambda x, v: net.apply(v, x, x, k, K, train=False), img, vf,
          base_ms=base_ms)

    # FLOPs / speed-of-light estimate
    try:
        lowered = jax.jit(
            lambda v, x: net.apply(v, x, x, k, K, train=False)
        ).lower(vf, img)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        fl = cost.get("flops", 0.0)
        print(f"XLA flops/batch: {fl/1e9:.1f} GF; SOL on v5e(197 bf16 TF/s): "
              f"{fl/197e12*1000:.1f} ms/batch")
    except Exception as e:  # cost analysis can be unsupported on tunnels
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
