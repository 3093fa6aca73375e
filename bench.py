"""Benchmark: full-net inference images/sec/chip at batch 256.

Prints one JSON line. The metric mirrors the reference's FPS measurement
(scripts/test.py:265-271 / full_net.py:277-457 cuda-sync timers): forward
of the flagship RootNetwithRegInt (hrnet32 rootnet + resnet50 regression,
256x256 inputs), jitted once and timed steady-state.

Two serving configurations are measured:
  * bf16 — the training-numerics path.
  * int8 — the w8a8 serving path (ops/quant.py): per-channel weight
    scales, per-tensor activation scales calibrated on the bench batch,
    int8 MXU convs (~2x bf16 on v5e, measured). The int8 number is the
    headline ONLY if a fidelity gate passes: max |uvd_int8 - uvd_bf16|
    < 1/64 (one integral-heatmap cell) on the same inputs — i.e. the
    quantized model localizes every keypoint to the same heatmap cell.
Both values are always reported in the JSON.

Timing notes for this hosted TPU runtime: block_until_ready returns
early, identical dispatches are memoized, and every dispatch+fetch pays a
~30 ms tunnel round trip. So each measurement runs M DISTINCT batches
inside ONE jitted lax.scan (device-side loop) and synchronizes with a
single device->host fetch; the RTT is amortized over M forwards.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256
BASELINE_IPS = 5000.0
M = 8
UVD_GATE = 1.0 / 64.0


def time_forward(model, variables, reg, root, k, K):
    @jax.jit
    def forward_many(variables, reg, root, k, K, offsets):
        def body(carry, off):
            out = model.apply(variables, reg + off, root + off, k, K, train=False)
            # reduce over EVERY output so XLA cannot dead-code-eliminate
            # any branch of the network
            total = sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
            return carry + total, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), offsets)
        return acc

    offsets = jnp.arange(M, dtype=jnp.float32) * 1e-6
    _ = float(forward_many(variables, reg, root, k, K, offsets))  # compile
    times = []
    for rep in range(3):
        off = offsets + jnp.float32(rep) * 1e-7
        _ = np.asarray(off[0])
        t0 = time.perf_counter()
        _ = float(forward_many(variables, reg, root, k, K, off))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / M


def main():
    from hrpe_tpu.models import FullNetConfig, build_full_net

    cfg = FullNetConfig(
        robot_type="panda",
        backbone_name="resnet50",
        rootnet_backbone_name="hrnet32",
        image_size=256,
    )
    bf16 = build_full_net(cfg, dtype=jnp.bfloat16)

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
    variables = jax.jit(lambda r: bf16.init(r, reg, root, k, K, train=False))(
        jax.random.PRNGKey(0)
    )

    dt_bf16 = time_forward(bf16, variables, reg, root, k, K)

    # --- int8 serving path: calibrate scales on the bench batch ---------
    calib = build_full_net(cfg, dtype=jnp.bfloat16, qmode="calib")
    qvars = jax.jit(
        lambda v, a, b, kk, KK: calib.apply(
            v, a, b, kk, KK, train=False, mutable=["quant"]
        )
    )(variables, reg, root, k, K)[1]
    int8 = build_full_net(cfg, dtype=jnp.bfloat16, qmode="int8")
    v8 = {**variables, **qvars}
    dt_int8 = time_forward(int8, v8, reg, root, k, K)

    # fidelity gate: keypoint uvd must stay within one heatmap cell
    @jax.jit
    def uvd_delta(variables, v8, reg, root, k, K):
        a = bf16.apply(variables, reg, root, k, K, train=False)["uvd"]
        b = int8.apply(v8, reg, root, k, K, train=False)["uvd"]
        return jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))

    delta = float(uvd_delta(variables, v8, reg, root, k, K))
    int8_ok = delta < UVD_GATE

    ips_bf16 = BATCH / dt_bf16
    ips_int8 = BATCH / dt_int8
    ips = ips_int8 if int8_ok else ips_bf16
    print(
        json.dumps(
            {
                "metric": "fullnet_inference_images_per_sec_per_chip_b256",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / BASELINE_IPS, 4),
                "bf16_images_per_sec": round(ips_bf16, 2),
                "int8_images_per_sec": round(ips_int8, 2),
                "int8_uvd_delta": round(delta, 6),
                "int8_fidelity_ok": bool(int8_ok),
            }
        )
    )


if __name__ == "__main__":
    main()
