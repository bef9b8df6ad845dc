"""velo_tpu — a TPU-native visual-LiDAR odometry framework.

A from-scratch JAX/Pallas rebuild of the capabilities of
``lichunshang/vision-enhanced-lidar-odometry`` (LOAM-style LiDAR odometry tightly
fused with pyramidal-KLT visual tracking, solved jointly with Levenberg-Marquardt,
evaluated on the KITTI odometry benchmark).

Design contract (see SURVEY.md / BASELINE.json in the repo root):
  * everything on-device is fixed-shape: padded point/feature tensors with
    validity masks, fixed iteration caps with convergence masks;
  * correspondence search is a voxel-hash fixed-radius grid (no KD-trees);
  * the joint solve is a batched 6-DoF Levenberg-Marquardt under
    ``jax.lax.while_loop`` (no Ceres);
  * one jitted ``step(carry, frame) -> (carry, pose)`` drives the whole
    pipeline, consumed by ``jax.lax.scan`` or a host streaming loop.
"""

import jax as _jax

# Pose-estimation math is accuracy-critical and tiny in FLOPs: a bf16-truncated
# 4x4 compose costs centimeters of error, dwarfing the 0.05% drift budget.
# Default every matmul to full float32 accumulation; the few large
# bandwidth-bound kernels opt into lower precision explicitly where safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the pipeline is a handful of large fixed-shape
# programs recompiled identically across runs; caching turns 30-60 s compiles
# into milliseconds on every run after the first.
import os as _os

_cache_dir = _os.environ.get("VELO_TPU_CACHE", "/tmp/velo_tpu_xla_cache")
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jaxlib without the option
    pass

__version__ = "0.1.0"
