"""Benchmark: full-net inference images/sec/chip at batch 256 (bf16).

Prints one JSON line. The metric mirrors the reference's FPS measurement
(scripts/test.py:265-271 / full_net.py:277-457 cuda-sync timers): forward
of the flagship RootNetwithRegInt (hrnet32 rootnet + resnet50 regression,
256x256 inputs) — here jitted once and timed steady-state with
block_until_ready. Baseline: 5000 images/sec/chip (BASELINE.json north
star for v5e).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256
BASELINE_IPS = 5000.0


def main():
    from hrpe_tpu.models import FullNetConfig, build_full_net

    cfg = FullNetConfig(
        robot_type="panda",
        backbone_name="resnet50",
        rootnet_backbone_name="hrnet32",
        image_size=256,
    )
    # plain layout: A/B measurement showed the space-to-depth packed twin
    # (models/hrnet_packed.py) is exact but NETS OUT SLOWER in the full
    # program on this chip (131 vs 116 ms/batch) — at 32x32 packed maps
    # the matmul M-dim shrinks 4x, erasing the lane-utilization gain.
    plain = build_full_net(cfg, dtype=jnp.bfloat16)
    model = plain

    rng = np.random.RandomState(0)
    reg = jnp.asarray(rng.rand(BATCH, 256, 256, 3), jnp.float32)
    root = jnp.asarray(rng.rand(BATCH, 256, 256, 3), jnp.float32)
    k = jnp.full((BATCH,), 1000.0, jnp.float32)
    K = jnp.tile(
        jnp.asarray(
            [[320.0, 0.0, 128.0], [0.0, 320.0, 128.0], [0.0, 0.0, 1.0]],
            jnp.float32,
        ),
        (BATCH, 1, 1),
    )
    variables = jax.jit(lambda r: plain.init(r, reg, root, k, K, train=False))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def forward(variables, reg, root, k, K):
        return model.apply(variables, reg, root, k, K, train=False)

    # Timing notes for this hosted TPU runtime: block_until_ready returns
    # early, identical dispatches are memoized, and every dispatch+fetch
    # pays a ~30 ms tunnel round trip. So the benchmark runs M DISTINCT
    # batches inside ONE jitted lax.scan (device-side loop, no host in
    # the middle) and synchronizes with a single device->host fetch; the
    # RTT is amortized over M forwards.
    M = 8

    @jax.jit
    def forward_many(variables, reg, root, k, K, offsets):
        def body(carry, off):
            out = model.apply(
                variables, reg + off, root + off, k, K, train=False
            )
            # reduce over EVERY output so XLA cannot dead-code-eliminate
            # any branch of the network
            total = sum(
                jnp.sum(v.astype(jnp.float32)) for v in out.values()
            )
            return carry + total, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), offsets)
        return acc

    offsets = jnp.arange(M, dtype=jnp.float32) * 1e-6
    # warmup / compile
    _ = float(forward_many(variables, reg, root, k, K, offsets))
    times = []
    for rep in range(3):
        off = offsets + jnp.float32(rep) * 1e-7
        _ = np.asarray(off[0])
        t0 = time.perf_counter()
        _ = float(forward_many(variables, reg, root, k, K, off))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / M

    ips = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "fullnet_inference_images_per_sec_per_chip_b256",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / BASELINE_IPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
