"""Module-level timing of the flagship full net at batch 256 on TPU.

Times each compute stage separately (scan-of-M device-side, single fetch,
same methodology as bench.py) so optimization effort lands where the
milliseconds are: rootnet hrnet32 trunk, resnet50 reg trunk, deconv+final
head, integral decode, MLP heads + FK.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256
M = 8


def timed(name, fn, *args):
    """fn must be jittable and return a pytree; times M scanned applies."""

    @jax.jit
    def many(*a):
        def body(carry, off):
            out = fn(*((a[0] + off,) + a[1:]))
            total = sum(
                jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(out)
            )
            return carry + total, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(M, dtype=a[0].dtype) * 1e-6)
        return acc

    _ = float(many(*args))  # compile+warmup
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(many(*args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / M * 1000
    print(f"{name:34s} {dt:8.2f} ms/batch   {BATCH/dt*1000:8.0f} img/s")
    return dt


def main():
    from hrpe_tpu.models import FullNetConfig, build_full_net
    from hrpe_tpu.models.hrnet import HRNet
    from hrpe_tpu.models.resnet import ResNet

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BATCH, 256, 256, 3), jnp.float32)

    # 1. rootnet trunk: hrnet32 feat-only
    hr = HRNet(32, 7, 64, generate_hm=False, generate_feat=True, dtype=dtype)
    vh = jax.jit(lambda r: hr.init(r, img, False))(jax.random.PRNGKey(0))
    timed("hrnet32 feat-only (rootnet)", lambda x, v: hr.apply(v, x, False), img, vh)

    # 2. reg trunk: resnet50 raw feature map
    rn = ResNet("resnet50", dtype)
    vr = jax.jit(lambda r: rn.init(r, img, False))(jax.random.PRNGKey(0))
    timed("resnet50 trunk (reg)", lambda x, v: rn.apply(v, x, False), img, vr)

    # 3. full net end-to-end
    cfg = FullNetConfig(robot_type="panda", backbone_name="resnet50",
                        rootnet_backbone_name="hrnet32", image_size=256)
    net = build_full_net(cfg, dtype=dtype)
    k = jnp.full((BATCH,), 1000.0, jnp.float32)
    K = jnp.tile(jnp.asarray([[320.0, 0, 128], [0, 320, 128], [0, 0, 1]],
                             jnp.float32), (BATCH, 1, 1))
    vf = jax.jit(lambda r: net.init(r, img, img, k, K, train=False))(jax.random.PRNGKey(0))
    timed("full net e2e", lambda x, v: net.apply(v, x, x, k, K, train=False), img, vf)

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
