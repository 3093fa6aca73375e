"""Two-process jax.distributed CPU smoke (multi-host init + collectives).

The fake-backend analogue of the reference's DDP/NCCL path
(train_depthnet.py:44-49 init_process_group, :350-360 all_reduce'd
validation stats): each process owns 2 virtual CPU devices, joins a
jax.distributed coordinator, builds the SAME 1-D ('data',) global mesh
the trainer uses, and exercises exactly the primitives the training code
relies on:

1. global-batch assembly from process-local shards
   (make_array_from_process_local_data — the loader's multi-host slicing,
   data/loader.py local_batch_size);
2. a jitted global mean over the sharded axis (XLA inserts the
   cross-process all-reduce — the gradient-reduction path);
3. multihost_utils.process_allgather(tiled) — the validation metric
   gather (engine/trainer.py validate, ref train_depthnet.py:334-365).

Run as: python -m hrpe_tpu.parallel.multihost_smoke <pid> <nproc> <port>
(launched once per process by tests/test_multihost.py).
"""

from __future__ import annotations

import os
import re
import sys


def main(pid: int, nproc: int, port: int, local_devices: int = 2) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    # REPLACE any inherited device-count flag (the test runner exports
    # count=8 for the virtual-mesh suite) — this process must own exactly
    # `local_devices`
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from hrpe_tpu.parallel import batch_sharding, make_mesh

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == local_devices
    n_global = jax.device_count()
    assert n_global == nproc * local_devices, n_global

    mesh = make_mesh()  # global mesh over all processes' devices
    bsh = batch_sharding(mesh)

    # 1. per-process local slice -> one global sharded batch
    per = 4  # local batch
    local = np.arange(per * pid, per * (pid + 1), dtype=np.float32)
    garr = jax.make_array_from_process_local_data(bsh, local, (per * nproc,))
    assert garr.shape == (per * nproc,)

    # 2. jitted global reduction over the sharded axis (cross-process)
    mean = jax.jit(lambda x: jnp.mean(x), out_shardings=None)(garr)
    expect = np.arange(per * nproc).mean()
    np.testing.assert_allclose(np.asarray(mean), expect, rtol=1e-6)

    # 3. validation-style allgather of per-process host metrics
    gathered = multihost_utils.process_allgather(
        np.full((3,), float(pid)), tiled=True
    )
    assert gathered.shape == (3 * nproc,), gathered.shape
    for p in range(nproc):
        np.testing.assert_allclose(gathered[3 * p : 3 * (p + 1)], float(p))

    print(f"MULTIHOST_OK pid={pid}/{nproc} devices={n_global} "
          f"mean={float(mean):.3f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
