"""Multi-chip dry-run child: the FULL sharded train step on a virtual CPU mesh.

Run as `python -m hrpe_tpu.parallel.dryrun <n_devices>` with a CLEAN
environment (no axon/TPU plugin): __graft_entry__.dryrun_multichip spawns
this in a subprocess because the driver's own process has already
initialized the TPU backend, and JAX backends cannot be switched after
init. Env is also forced here, defensively, before jax is imported.

The step is the real data-parallel training step — all 10 weighted losses
(SURVEY.md §2.3 / ref lib/core/function.py:200-358), batch sharded over a
1-D ('data',) Mesh, params replicated, gradient all-reduce inserted by XLA
from the shardings. The model is deliberately slim (resnet18 both branches
at 64 px, B=2/device) so the whole run — import, trace, CPU compile,
execute — finishes in ~1 minute; the sharding semantics are identical to
the production resnet50+hrnet32 configuration.
"""

from __future__ import annotations

import os
import sys


def _force_cpu(n_devices: int) -> None:
    # Must happen before jax initializes a backend. The hosted image pins
    # JAX_PLATFORMS=axon and injects the TPU plugin via sitecustomize when
    # PALLAS_AXON_POOL_IPS is set — scrub both.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()


def main(n_devices: int) -> None:
    _force_cpu(n_devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) >= n_devices, (len(devices), n_devices)

    from hrpe_tpu.config import make_default_config
    from hrpe_tpu.engine.schedules import make_optimizer
    from hrpe_tpu.engine.train_state import create_train_state, make_full_net_step
    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.models import FullNetConfig, build_full_net
    from hrpe_tpu.parallel import batch_sharding, make_mesh, replicate_sharding

    mesh = make_mesh(devices[:n_devices])

    cfg = make_default_config()
    cfg.urdf_robot_name = "panda"
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.image_size = 64.0
    cfg.other_image_size = 64.0
    cfg.rootnet_image_size = 64.0
    # enable every loss term so the dry-run compiles the full graph
    cfg.pose_loss_weight = 1.0
    cfg.rot_loss_weight = 1.0
    cfg.trans_loss_weight = 1.0
    cfg.depth_loss_weight = 10.0
    cfg.uv_loss_weight = 1.0
    cfg.kp2d_loss_weight = 10.0
    cfg.kp3d_loss_weight = 10.0
    cfg.kp2d_int_loss_weight = 10.0
    cfg.kp3d_int_loss_weight = 10.0
    cfg.align_3d_loss_weight = 1.0

    mcfg = FullNetConfig(
        robot_type="panda",
        backbone_name="resnet18",
        rootnet_backbone_name="resnet18",
        image_size=64,
    )
    model = build_full_net(mcfg)
    robot = load_robot("panda")
    tx = make_optimizer(cfg)

    B = 2 * n_devices
    S = 64
    nk, dof = 7, 8
    rng = np.random.RandomState(0)
    crop_K = np.asarray([[320.0, 0, 32.0], [0, 320.0, 32.0], [0, 0, 1]], np.float32)
    orig_K = np.asarray([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]], np.float32)
    batch = {
        "root_images": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "other_images": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "root_K": np.tile(crop_K, (B, 1, 1)),
        "other_K": np.tile(crop_K, (B, 1, 1)),
        "K_original": np.tile(orig_K, (B, 1, 1)),
        "TCO": np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)),
        "jointpose": rng.uniform(-0.3, 0.3, (B, dof)).astype(np.float32),
        "keypoints_2d_original": rng.uniform(0, 400, (B, nk, 2)).astype(np.float32),
        "valid_mask": np.ones((B, nk), np.float32),
        "bbox_strict_bounded_original": np.tile(
            np.asarray([100, 100, 400, 380], np.float32), (B, 1)
        ),
        "root_bbox_strict_bounded": np.tile(
            np.asarray([10, 10, 60, 60], np.float32), (B, 1)
        ),
        "root_bbox_gt2d_extended": np.tile(
            np.asarray([5, 5, 62, 62], np.float32), (B, 1)
        ),
        "other_keypoints_2d": rng.uniform(0, S, (B, nk, 2)).astype(np.float32),
        "other_keypoints_3d": rng.uniform(-0.3, 0.3, (B, nk, 3)).astype(np.float32),
        "other_valid_mask_crop": np.ones((B, nk), np.float32),
    }
    batch["TCO"][:, 2, 3] = 1.0

    with mesh:
        state = create_train_state(
            model,
            tx,
            jax.random.PRNGKey(0),
            (
                jnp.zeros((B, S, S, 3)),
                jnp.zeros((B, S, S, 3)),
                jnp.ones((B,)),
                jnp.asarray(batch["other_K"]),
            ),
        )
        rep = replicate_sharding(mesh)
        bsh = batch_sharding(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        batch_dev = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), bsh), batch
        )
        step = make_full_net_step(cfg, model, tx, robot, use_pnp=False)
        new_state, loss_dict = step(state, batch_dev, jax.random.PRNGKey(1))
        jax.block_until_ready(loss_dict["loss"])
        loss = float(loss_dict["loss"])
        assert np.isfinite(loss), loss_dict
        # the updated params really are sharded-replicated over the mesh
        assert int(new_state.step) == 1
    print(f"DRYRUN_OK n_devices={n_devices} loss={loss:.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
