"""hrpe_tpu — TPU-native holistic robot pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
Grz684/Holistic-Robot-Pose-Estimation-Study (ECCV 2024, "Real-time Holistic
Robot Pose Estimation with Unknown States"): single-RGB-image estimation of
robot joint angles, root-to-camera 6D pose, and 2D/3D keypoints for
Panda / Kuka / Baxter / Dofbot arms, with synthetic-data training and
self-supervised sim2real fine-tuning via a differentiable silhouette renderer.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  config/      — typed config tree + YAML overlay (ref: lib/core/config.py)
  utils/       — rotation/geometry/coordinate math   (ref: lib/utils/geometries.py, transforms.py)
  kinematics/  — URDF parsing + batched FK as compiled XLA graphs
                 (ref: lib/utils/urdfpytorch/, lib/utils/urdf_robot.py)
  models/      — flax.linen HRNet/ResNet backbones, integral decode,
                 RootNet, RootNetwithRegInt (ref: lib/models/)
  ops/         — Pallas TPU kernels for hot paths
  pnp/         — batched EPnP + Gauss-Newton with implicit-diff gradients
                 (ref: lib/utils/BPnP.py, OpenCV solvePnP)
  render/      — differentiable soft silhouette rasterizer
                 (ref: lib/utils/mesh_renderer.py, pytorch3d)
  data/        — DREAM dataset pipeline, both annotation dialects
                 (ref: lib/dataset/)
  engine/      — unified train/eval loops, losses, metrics, checkpoints
                 (ref: scripts/train_*.py, lib/core/function.py)
  parallel/    — jax.sharding mesh + data-parallel step sharding
                 (ref: DDP/Accelerate usage in scripts/)
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls on f32 inputs default to bf16 passes, which corrupts the
# geometry/FK/PnP math (sub-pixel projection accuracy matters for AUC
# metrics). Force full f32 precision for f32 matmuls; the model's conv
# stack explicitly runs in bfloat16 via its dtype and is unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

# The hosted axon TPU plugin overrides JAX_PLATFORMS at registration, so
# the usual `JAX_PLATFORMS=cpu` escape hatch silently lands on the TPU.
# HRPE_FORCE_CPU=1 pins the CPU backend reliably (used by CPU-side tools
# and tests running next to a TPU-occupying training job).
import os as _os

if _os.environ.get("HRPE_FORCE_CPU"):
    _jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the hosted TPU tunnel compiles the
# big train/eval programs in minutes; caching them on disk makes every
# script/test after the first pay ~0. Safe on CPU too (tests).
_cache_dir = _os.environ.get(
    "HRPE_JAX_CACHE", _os.path.expanduser("~/.cache/hrpe_jax_cache")
)
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # cache every backend's XLA artifacts (CPU included — the test suite
    # compiles the same train/eval programs on every run)
    _jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # older jax without the knobs: cache is an optimization only
    pass
