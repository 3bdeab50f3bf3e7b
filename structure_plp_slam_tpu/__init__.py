"""structure_plp_slam_tpu — a TPU-native visual SLAM framework.

A from-scratch re-design of the capabilities of Structure PLP-SLAM
(reference: PeterFWS/Structure-PLP-SLAM) as an idiomatic JAX/XLA/Pallas
framework for TPU hardware.

Architecture stance (vs. the reference's pointer-graph C++ design):

* The map is a set of fixed-capacity, device-resident SoA arrays
  (``data.map_state.MapState``) — keyframe poses ``[K, 3, 4]``, points
  ``[L, 3]``, descriptors ``[L, 8] uint32``, observation index tensors with
  validity masks — instead of heap-allocated keyframe/landmark objects
  guarded by a global mutex (reference: src/PLPSLAM/data/map_database.h).
* All per-frame hot paths (ORB pyramid/FAST/BRIEF, Hamming matching,
  projection matching, motion-only pose LM, local Schur-complement BA) are
  jitted batched kernels with static shapes (reference: per-call g2o graphs,
  src/PLPSLAM/optimize/).
* The reference's 3-thread pipeline (tracking / mapping / loop closing,
  src/PLPSLAM/system.cc:206-207) becomes host-side orchestration of async
  device dispatch; fork-join thread pairs become batched kernels.
* Multi-chip scaling (absent in the reference) shards observation blocks
  over a ``jax.sharding.Mesh`` with ``psum`` reduction of the Schur
  camera system (``parallel.distributed_ba``).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (Lie ops, LM solvers, Schur complement) must run in true float32:
# on TPU the MXU otherwise decomposes f32 matmuls into bf16 passes, which is
# far too coarse for normal-equation solves. Hot large-matmul kernels that
# tolerate lower precision (descriptor distance, image convs) request it
# explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

from structure_plp_slam_tpu.utils import types as types  # noqa: F401
