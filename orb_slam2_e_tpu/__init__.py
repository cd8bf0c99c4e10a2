"""ORB-SLAM2-E TPU: a TPU-native SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ORB-SLAM2-E
(UZ-SLAMLab/ORB_SLAM2_E): real-time feature-based SLAM for monocular / stereo /
RGB-D cameras — tracking, local mapping, loop closing, relocalization, sparse
3D mapping — extended with a finite-element deformation model embedded in the
non-linear pose optimization (deformable relocalization for endoscopy).

Architecture (TPU-first, not a port):
  - Map state is a fixed-capacity structure-of-arrays pytree (keyframe pool,
    landmark pool, observation COO arrays) with liveness masks — no pointer
    graphs, no mutexes.
  - Per-frame tracking is a jitted functional step; mapping / loop closing are
    batched device computations dispatched asynchronously by a host
    orchestrator (JAX async dispatch replaces the reference's threads).
  - Hot kernels (ORB pyramid/FAST/descriptors, Hamming matching, BA
    residual/Jacobian/Schur, FEM assembly) run as XLA/Pallas programs sized
    for the MXU/VPU.
  - Scale-out shards landmark blocks over a `jax.sharding.Mesh` and runs
    distributed bundle adjustment via Schur-complement reduction with
    `psum` collectives (see `orb_slam2_e_tpu.parallel`).

Layer map (mirrors reference layers L0-L9, SURVEY.md §1):
  ops.lie / ops.camera       L0 math + conversions
  ops.orb / ops.matching     L1 feature kernels
  ops.bow / models.kf_database  L2 place recognition
  models.map_state           L3 map data model
  models.tracking / models.local_mapping / models.loop_closing  L4 pipeline
  ops.ba / ops.ransac / ops.sim3 / ops.epnp  L5 optimization backend
  ops.fem                    L5e deformable/FEM engine
  models.system              L6 facade
  models.viewer              L7 visualization (headless renders)
  examples/                  L8 drivers
  utils.config / utils.stats L9 config + metrics
"""

import jax as _jax

# Geometry/BA math requires true float32 matmuls. This JAX build's DEFAULT
# matmul precision maps to bfloat16 passes (TPU MXU convention) — a 3x3
# rotation product then carries ~1e-2 error, which breaks pose optimization.
# Kernels that genuinely want lower precision (descriptor int8 dots are
# exact anyway) request it explicitly via `precision=`/`preferred_element_type`.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
